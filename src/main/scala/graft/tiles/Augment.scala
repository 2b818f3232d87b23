package graft.tiles

import org.apache.spark.sql.Dataset

/** AI training-data augmentation + masking over the distributed tile
  * plane — the Spark re-expression of the reference's per-sample numpy
  * kernels (reference: buteo/ai/augmentation/{basic,transform,noise,mix,
  * labels}.py and buteo/ai/masking/{pixel,line,shape}_masking.py).
  *
  * Design notes:
  *  - Whole-raster rot90/mirror are pure TILE-KEY REMAPS + a local pixel
  *    permutation — a map with zero shuffle (the tile that holds the
  *    data never moves; only its grid key and local layout change).
  *  - Every stochastic op replaces the reference's `np.random` stream
  *    with a DETERMINISTIC splittable LCG keyed on (seed, tile, pixel,
  *    band): the same op on the same input always produces the same
  *    output on any cluster size or partitioning — the property the
  *    reference loses under numba parallel RNG, and the one that makes
  *    augmentation reproducible (and oracle-checkable) at 100 TB.
  *  - Per-PATCH semantics: the reference augments one training sample
  *    (patch) at a time; here one Tile IS one patch, so "per-image"
  *    draws key on (cellX, cellY) and per-pixel draws key on global
  *    pixel coordinates.
  *  - mixup/cutmix pair two tile planes with a sort-merge join on the
  *    tile key — co-partitioned, no broadcast needed, scales linearly.
  */
object Augment {

  // ---- deterministic RNG (MINSTD core), mirrored by the SQL oracles ----
  private val M = 2147483647L // 2^31 - 1

  /** Uniform [0,1): two MINSTD steps over a linear coordinate mix. The
    * worst-case linear mix is ~8.07e18 ≈ 2^62.8 — it fits signed 64-bit
    * (< 2^63), so the same expression evaluates exactly in DuckDB BIGINT
    * arithmetic (the oracle mirror); any new key term must keep the mix
    * under 2^63, not 2^62. Inputs are first
    * reduced mod (M−1) into [0, M−1): identical for the in-range values
    * the oracles use, and it keeps negative or 2^32-scale seeds/coords
    * from overflowing Long (which would push u01 outside [0,1) and turn
    * e.g. a pixel mask into all-zeros silently).
    */
  def u01(seed: Long, a: Long, b: Long, c: Long): Double = {
    def norm(v: Long): Long = { val m = v % (M - 1); if (m < 0) m + (M - 1) else m }
    var h = (norm(seed) * 1103515245L + norm(a) * 12345L +
      norm(b) * 2654435761L + norm(c) * 97531L) % (M - 1) + 1
    h = h * 48271L % M
    h = h * 48271L % M
    h.toDouble / M
  }

  /** The SQL text of `u01` for oracle authoring (same ops, same order;
    * BIGINT casts keep DuckDB off its overflow-checked INT32 path).
    * Mirrors `u01` for NON-NEGATIVE arguments below 2^31−2 — the only
    * values the oracle fixtures use. It does NOT reproduce u01's norm()
    * wrap: a negative seed/coordinate here would yield a negative DuckDB
    * remainder and diverge — author oracles with in-range keys only.
    */
  def u01Sql(seed: Long, a: String, b: String, c: String): String =
    s"(((CAST($seed AS BIGINT)*1103515245 + CAST($a AS BIGINT)*12345" +
      s" + CAST($b AS BIGINT)*2654435761 + CAST($c AS BIGINT)*97531) % ${M - 1} + 1)" +
      s" * 48271 % $M) * 48271 % $M / $M.0"

  /** splitmix64 finalizer — full-avalanche mixing for the normal path
    * (Box-Muller needs INDEPENDENT uniforms; the linear-mix MINSTD above
    * leaves coordinate-adjacent draws correlated, which biases z. The
    * normal ops have no SQL oracle, so no mirror constraint here).
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def u01Strong(seed: Long, a: Long, b: Long, c: Long): Double =
    ((mix64(mix64(mix64(seed) ^ a) ^ (b << 20)) ^ (c << 40)) >>> 11) / 9007199254740992.0

  /** Standard normal via Box-Muller over two independent strong draws. */
  def n01(seed: Long, a: Long, b: Long, c: Long): Double = {
    val u1 = math.max(u01Strong(seed, a, b, c), 1e-12)
    val u2 = u01Strong(seed + 0x5851f42d4c957f2dL, a, b, c)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  import org.apache.spark.sql.{Encoder, Encoders}
  private implicit lazy val tileEnc: Encoder[Tile] = Encoders.product[Tile]

  // =================== whole-raster rotation / mirror ===================

  /** np.rot90(A, k) over the tiled raster (reference:
    * buteo/ai/augmentation/basic.py:14-38; k=1 is CCW). Requires the
    * grid to tile exactly (tileSize | width, height) — the augmentation
    * patch grids always do. Returns tiles on the rotated grid of
    * `spec.copy(width=height, height=width)` for odd k.
    */
  def rot90(tiles: Dataset[Tile], spec: RasterSpec, k: Int): Dataset[Tile] = {
    require(spec.width % spec.tileSize == 0 && spec.height % spec.tileSize == 0,
      "rot90 needs an exact tile grid")
    val t = spec.tileSize
    val tx = spec.tilesX; val ty = spec.tilesY
    val outSpec = if (k % 2 == 1) spec.copy(width = spec.height, height = spec.width) else spec
    val kk = ((k % 4) + 4) % 4
    tiles.map { in =>
      val p = in.pixels
      val out = new Array[Double](p.length)
      var r = 0
      while (r < t) {
        var c = 0
        while (c < t) {
          // out[r', c'] = in[r, c] under np.rot90 k
          val (rp, cp) = kk match {
            case 1 => (t - 1 - c, r)
            case 2 => (t - 1 - r, t - 1 - c)
            case 3 => (c, t - 1 - r)
            case _ => (r, c)
          }
          out(rp * t + cp) = p(r * t + c)
          c += 1
        }
        r += 1
      }
      val (ncx, ncy) = kk match {
        case 1 => (in.cellY, tx - 1 - in.cellX)
        case 2 => (tx - 1 - in.cellX, ty - 1 - in.cellY)
        case 3 => (ty - 1 - in.cellY, in.cellX)
        case _ => (in.cellX, in.cellY)
      }
      val (ox, oy) = outSpec.tileOrigin(ncx, ncy)
      in.copy(cellX = ncx, cellY = ncy, originX = ox, originY = oy,
        pixels = if (kk == 0) p else out)
    }
  }

  /** Mirror (reference basic.py:40-73): k=1 flips horizontally (cols),
    * k=2 vertically (rows), k=3 both. Tile-key remap + local reversal.
    */
  def mirror(tiles: Dataset[Tile], spec: RasterSpec, k: Int): Dataset[Tile] = {
    require(spec.width % spec.tileSize == 0 && spec.height % spec.tileSize == 0,
      "mirror needs an exact tile grid")
    val t = spec.tileSize
    val tx = spec.tilesX; val ty = spec.tilesY
    val flipH = k == 1 || k == 3
    val flipV = k == 2 || k == 3
    tiles.map { in =>
      val p = in.pixels
      val out = new Array[Double](p.length)
      var r = 0
      while (r < t) {
        var c = 0
        while (c < t) {
          val rp = if (flipV) t - 1 - r else r
          val cp = if (flipH) t - 1 - c else c
          out(rp * t + cp) = p(r * t + c)
          c += 1
        }
        r += 1
      }
      val ncx = if (flipH) tx - 1 - in.cellX else in.cellX
      val ncy = if (flipV) ty - 1 - in.cellY else in.cellY
      val (ox, oy) = spec.tileOrigin(ncx, ncy)
      in.copy(cellX = ncx, cellY = ncy, originX = ox, originY = oy, pixels = out)
    }
  }

  // ======================= per-patch augmentation =======================

  /** Per-patch seeded rotation (reference basic.py:75-138: k drawn from
    * {1,2,3} per sample, same k for every channel — the XY form rotates
    * features and labels identically, which the shared (cellX,cellY)
    * key gives for free). Non-square border tiles get k=2 (180° needs
    * no dimension swap).
    */
  def rotationPatch(tiles: Dataset[Tile], seed: Long): Dataset[Tile] =
    tiles.map { in =>
      val k0 = 1 + math.min((u01(seed, in.cellX, in.cellY, 0) * 3).toInt, 2)
      val k = if (in.w == in.h) k0 else 2
      in.copy(pixels = rotLocal(in.pixels, in.w, in.h, k))
    }

  /** Per-patch seeded mirror (reference basic.py:210-275). */
  def mirrorPatch(tiles: Dataset[Tile], seed: Long): Dataset[Tile] =
    tiles.map { in =>
      val k = 1 + math.min((u01(seed, in.cellX, in.cellY, 1) * 3).toInt, 2)
      val p = in.pixels
      val out = new Array[Double](p.length)
      val flipH = k == 1 || k == 3
      val flipV = k == 2 || k == 3
      var r = 0
      while (r < in.h) {
        var c = 0
        while (c < in.w) {
          val rp = if (flipV) in.h - 1 - r else r
          val cp = if (flipH) in.w - 1 - c else c
          out(rp * in.w + cp) = p(r * in.w + c)
          c += 1
        }
        r += 1
      }
      in.copy(pixels = out)
    }

  private def rotLocal(p: Array[Double], w: Int, h: Int, k: Int): Array[Double] = {
    val out = new Array[Double](p.length)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        k match {
          case 1 => out((w - 1 - c) * h + r) = p(r * w + c)
          case 2 => out((h - 1 - r) * w + (w - 1 - c)) = p(r * w + c)
          case 3 => out(c * h + (h - 1 - r)) = p(r * w + c)
          case _ => out(r * w + c) = p(r * w + c)
        }
        c += 1
      }
      r += 1
    }
    out
  }

  /** Channel scale (reference transform.py:23-81): one amount per patch,
    * one uniform draw per channel; additive adds U(-amount, amount),
    * multiplicative scales by U(1-amount, 1+amount).
    */
  def channelScale(tiles: Dataset[Tile], maxAmount: Double, additive: Boolean,
                   seed: Long): Dataset[Tile] =
    tiles.map { in =>
      val amount = u01(seed, in.cellX, in.cellY, 0) * maxAmount
      val r = u01(seed, in.cellX, in.cellY, 100 + in.band)
      val delta = -amount + 2.0 * amount * r
      val out =
        if (additive) in.pixels.map(_ + delta)
        else { val f = 1.0 + delta; in.pixels.map(_ * f) }
      in.copy(pixels = out)
    }

  /** Contrast (reference transform.py:107-157): per-channel mean pulled
    * then X = (X - mean)(1 + amount) + mean; amount = U(0,1)·max per
    * patch.
    */
  def contrast(tiles: Dataset[Tile], maxAmount: Double, seed: Long): Dataset[Tile] =
    tiles.map { in =>
      val amount = u01(seed, in.cellX, in.cellY, 0) * maxAmount
      var s = 0.0
      var i = 0
      while (i < in.pixels.length) { s += in.pixels(i); i += 1 }
      val mean = s / in.pixels.length
      val f = 1.0 + amount
      in.copy(pixels = in.pixels.map(v => (v - mean) * f + mean))
    }

  /** Uniform noise (reference noise.py:13-88): one amount PER PATCH
    * (the reference draws a fresh amount per sample); per-pixel draws
    * keyed on GLOBAL pixel coords (`tileSize` anchors border tiles —
    * keying on the tile's own trimmed w/h would collide border pixels
    * with interior ones); `perChannel=false` re-uses band-0 draws so
    * every channel gets the same noise field.
    */
  def noiseUniform(tiles: Dataset[Tile], tileSize: Int, maxAmount: Double,
                   additive: Boolean, perChannel: Boolean, seed: Long): Dataset[Tile] =
    tiles.map { in =>
      val amount = u01(seed, in.cellX, in.cellY, 0) * maxAmount
      val out = new Array[Double](in.pixels.length)
      var r = 0
      while (r < in.h) {
        var c = 0
        while (c < in.w) {
          val gx = in.cellX.toLong * tileSize + c
          val gy = in.cellY.toLong * tileSize + r
          val band = if (perChannel) in.band.toLong else 0L
          val u = u01(seed, gx, gy, 1000 + band)
          val i = r * in.w + c
          out(i) =
            if (additive) in.pixels(i) + (-amount + 2.0 * amount * u)
            else in.pixels(i) * (1.0 - amount + 2.0 * amount * u)
          c += 1
        }
        r += 1
      }
      in.copy(pixels = out)
    }

  /** Normal noise (reference noise.py:116-192): Box-Muller over the same
    * keyed stream; additive N(0, amount), multiplicative N(1, amount).
    */
  def noiseNormal(tiles: Dataset[Tile], tileSize: Int, maxAmount: Double,
                  additive: Boolean, perChannel: Boolean, seed: Long): Dataset[Tile] =
    tiles.map { in =>
      val amount = u01(seed, in.cellX, in.cellY, 0) * maxAmount
      val out = new Array[Double](in.pixels.length)
      var r = 0
      while (r < in.h) {
        var c = 0
        while (c < in.w) {
          val gx = in.cellX.toLong * tileSize + c
          val gy = in.cellY.toLong * tileSize + r
          val band = if (perChannel) in.band.toLong else 0L
          val z = n01(seed, gx, gy, 2000 + 2 * band)
          val i = r * in.w + c
          out(i) =
            if (additive) in.pixels(i) + amount * z
            else in.pixels(i) * (1.0 + amount * z)
          c += 1
        }
        r += 1
      }
      in.copy(pixels = out)
    }

  /** Label smoothing, flat form (reference labels.py:13-72):
    * y ← (1-a)·y + a·mean(y) with the patch mean; `fixedAmount` uses
    * maxAmount directly.
    */
  def labelSmoothFlat(tiles: Dataset[Tile], maxAmount: Double,
                      fixedAmount: Boolean, seed: Long): Dataset[Tile] =
    tiles.map { in =>
      val a =
        if (fixedAmount) maxAmount
        else u01(seed, in.cellX, in.cellY, 0) * maxAmount
      var s = 0.0
      var i = 0
      while (i < in.pixels.length) { s += in.pixels(i); i += 1 }
      val mean = s / in.pixels.length
      in.copy(pixels = in.pixels.map(v => (1.0 - a) * v + a * mean))
    }

  private def keyJoin(target: Dataset[Tile], source: Dataset[Tile]): Dataset[(Tile, Tile)] = {
    implicit val pairEnc: org.apache.spark.sql.Encoder[(Tile, Tile)] =
      Encoders.tuple(tileEnc, tileEnc)
    target.joinWith(source,
      target("cellX") === source("cellX") &&
        target("cellY") === source("cellY") &&
        target("band") === source("band"))
  }

  /** Mixup (reference mix.py:116-206): λ = min(U(min, max+0.001), 1) per
    * patch; X ← λ·X_target + (1-λ)·X_source. Pairing is a sort-merge
    * join on the tile key.
    */
  def mixup(target: Dataset[Tile], source: Dataset[Tile],
            minSize: Double = 0.333, maxSize: Double = 0.666,
            seed: Long = 42L): Dataset[Tile] =
    keyJoin(target, source).map { case (t, s) =>
      val lam = math.min(
        minSize + u01(seed, t.cellX, t.cellY, 0) * (maxSize + 0.001 - minSize), 1.0)
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < out.length) {
        out(i) = t.pixels(i) * lam + s.pixels(i) * (1.0 - lam)
        i += 1
      }
      t.copy(pixels = out)
    }

  /** Cutmix (reference mix.py:13-87): per patch, a random sub-rectangle
    * of the source replaces the target; box drawn with the reference's
    * randint bounds (height first, then width, then y0, then x0).
    */
  def cutmix(target: Dataset[Tile], source: Dataset[Tile],
             minSize: Double = 0.333, maxSize: Double = 0.666,
             seed: Long = 42L): Dataset[Tile] =
    keyJoin(target, source).map { case (t, s) =>
      val h = t.h; val w = t.w
      val minH = (h * minSize).toInt; val maxH = (h * maxSize).toInt
      val minW = (w * minSize).toInt; val maxW = (w * maxSize).toInt
      val ph = minH + (u01(seed, t.cellX, t.cellY, 1) * (maxH - minH)).toInt
      val pw = minW + (u01(seed, t.cellX, t.cellY, 2) * (maxW - minW)).toInt
      val x0 = (u01(seed, t.cellX, t.cellY, 3) * (w - pw)).toInt
      val y0 = (u01(seed, t.cellX, t.cellY, 4) * (h - ph)).toInt
      val out = t.pixels.clone()
      var r = y0
      while (r < y0 + ph) {
        var c = x0
        while (c < x0 + pw) {
          out(r * w + c) = s.pixels(r * w + c)
          c += 1
        }
        r += 1
      }
      t.copy(pixels = out)
    }

  /** Blur (reference transform.py:182-263): gaussian-weighted circular
    * radius-1 kernel over the existing weighted-convolve path.
    */
  def blur(tiles: Dataset[Tile]): Dataset[Tile] =
    TileOps.convolve(tiles, 1, "sum",
      weight = Kernels.base(1.0, circular = true, distanceWeighted = true, method = 3),
      normalised = true)

  /** Sharpen (reference transform.py:322-410): the unsharp kernel at
    * radius 1, intensity 1 — delegates to the oracle-checked unsharp op.
    */
  def sharpen(tiles: Dataset[Tile]): Dataset[Tile] =
    TileOps2.unsharpMask(tiles, 1, 1.0)

  /** Misalign (reference transform.py:469-579): sub-pixel shift via the
    * bilinear shift kernel (kernels.py kernel_shift) — offsets drawn
    * once per call, capped at `maxOffset` like the reference's
    * min(rand, max_offset).
    */
  def misalign(tiles: Dataset[Tile], maxOffset: Double = 0.5,
               seed: Long = 42L): Dataset[Tile] = {
    val fx = math.min(u01(seed, 1, 0, 0), maxOffset)
    val fy = math.min(u01(seed, 2, 0, 0), maxOffset)
    TileOps.convolve(tiles, 1, "sum",
      weight = (dx, dy) => {
        val wx = if (dx == 0) 1.0 - fx else if (dx == 1) fx else 0.0
        val wy = if (dy == 0) 1.0 - fy else if (dy == 1) fy else 0.0
        wx * wy
      },
      normalised = false)
  }

  /** Positional-encoding plane (reference: buteo/ai/encoding.py:296-
    * encode_arr_position + encode_width :267): 3 channels per pixel —
    * band 0 linear along y (row/rowEnd), bands 1-2 the cyclical sin/cos
    * of the x axis ((trig(2π·x/xEnd)+1)/2 — "width is cyclical", the
    * global-map longitude case). Derived from band-0 tiles; emitted as
    * a 3-band plane on the same grid.
    */
  def encodeArrPosition(tiles: Dataset[Tile], spec: RasterSpec): Dataset[Tile] = {
    // a 1-pixel-wide/tall raster would divide by zero and emit NaN planes
    // silently (ADVICE r3)
    require(spec.width > 1 && spec.height > 1,
      s"encodeArrPosition needs width/height > 1, got ${spec.width}x${spec.height}")
    val xEnd = (spec.width - 1).toDouble
    val yEnd = (spec.height - 1).toDouble
    tiles.filter((t: Tile) => t.band == 0).flatMap { t =>
      (0 until 3).iterator.map { b =>
        val out = new Array[Double](t.pixels.length)
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val gx = (t.cellX.toLong * spec.tileSize + c).toDouble
            val gy = (t.cellY.toLong * spec.tileSize + r).toDouble
            out(r * t.w + c) = b match {
              case 0 => gy / yEnd
              case 1 => (math.sin(2.0 * math.Pi * (gx / xEnd)) + 1.0) / 2.0
              case _ => (math.cos(2.0 * math.Pi * (gx / xEnd)) + 1.0) / 2.0
            }
            c += 1
          }
          r += 1
        }
        t.copy(band = b, pixels = out)
      }
    }
  }

  // ============================== masking ==============================
  // Masks are emitted as tile planes of 0/1 (reference returns uint8
  // masks); applyMask multiplies them onto a data plane.

  /** Pixel mask, 2D (reference pixel_masking.py:12-46): same mask on
    * every channel — drawn from band-0 keyed coords.
    */
  def maskPixels2d(tiles: Dataset[Tile], tileSize: Int, p: Double,
                   seed: Long): Dataset[Tile] =
    maskPixels(tiles, tileSize, p, seed, perChannel = false)

  /** Pixel mask, 3D (reference pixel_masking.py:66-91): independent per
    * channel.
    */
  def maskPixels3d(tiles: Dataset[Tile], tileSize: Int, p: Double,
                   seed: Long): Dataset[Tile] =
    maskPixels(tiles, tileSize, p, seed, perChannel = true)

  private def maskPixels(tiles: Dataset[Tile], tileSize: Int, p: Double,
                         seed: Long, perChannel: Boolean): Dataset[Tile] =
    tiles.map { in =>
      val out = new Array[Double](in.pixels.length)
      var r = 0
      while (r < in.h) {
        var c = 0
        while (c < in.w) {
          val gx = in.cellX.toLong * tileSize + c
          val gy = in.cellY.toLong * tileSize + r
          val band = if (perChannel) in.band.toLong else 0L
          out(r * in.w + c) = if (u01(seed, gx, gy, 3000 + band) > p) 1.0 else 0.0
          c += 1
        }
        r += 1
      }
      in.copy(pixels = out)
    }

  /** Channel mask (reference pixel_masking.py:111-155): up to
    * `maxChannels` draws; each zeroes one whole channel with prob p.
    */
  def maskChannels(tiles: Dataset[Tile], p: Double, channels: Int,
                   maxChannels: Int, seed: Long): Dataset[Tile] =
    tiles.map { in =>
      var masked = false
      var t = 0
      while (t < maxChannels) {
        if (u01(seed, in.cellX, in.cellY, 4000 + t) < p) {
          val ch = (u01(seed, in.cellX, in.cellY, 4100 + t) * channels).toInt
          if (ch == in.band) masked = true
        }
        t += 1
      }
      in.copy(pixels = Array.fill(in.pixels.length)(if (masked) 0.0 else 1.0))
    }

  /** Rectangle mask (reference shape_masking.py:332-406): with prob p
    * per patch, zero one random sub-rectangle on all channels.
    */
  def maskRectangle(tiles: Dataset[Tile], p: Double,
                    maxHeight: Double = 0.5, maxWidth: Double = 0.5,
                    minHeight: Double = 0.1, minWidth: Double = 0.1,
                    seed: Long = 42L): Dataset[Tile] =
    tiles.map { in =>
      val out = Array.fill(in.pixels.length)(1.0)
      if (u01(seed, in.cellX, in.cellY, 5000) <= p) {
        val h = in.h; val w = in.w
        val maxH = (maxHeight * h).toInt; val maxW = (maxWidth * w).toInt
        val minH = math.max(1, (minHeight * h).toInt)
        val minW = math.max(1, (minWidth * w).toInt)
        // randint(lo, hi+1) ≡ lo + floor(u * (hi - lo + 1))
        val mh = minH + (u01(seed, in.cellX, in.cellY, 5001) * (maxH - minH + 1)).toInt
        val mw = minW + (u01(seed, in.cellX, in.cellY, 5002) * (maxW - minW + 1)).toInt
        val y0 = (u01(seed, in.cellX, in.cellY, 5003) * (h - mh + 1)).toInt
        val x0 = (u01(seed, in.cellX, in.cellY, 5004) * (w - mw + 1)).toInt
        var r = y0
        while (r < y0 + mh) {
          var c = x0
          while (c < x0 + mw) { out(r * in.w + c) = 0.0; c += 1 }
          r += 1
        }
      }
      in.copy(pixels = out)
    }

  /** Line mask (reference line_masking.py:9-110): each row/column is a
    * line seed with prob p; vertical lines run down a random span of a
    * 1-3 px thick column, horizontal mirror that. Deterministic analog
    * of the reference's sequential numpy draws.
    */
  def maskLines(tiles: Dataset[Tile], tileSize: Int, p: Double,
                minFrac: Double = 0.1, maxFrac: Double = 1.0,
                minSize: Int = 1, maxSize: Int = 3,
                seed: Long = 42L): Dataset[Tile] =
    tiles.map { in =>
      val h = in.h; val w = in.w
      val out = Array.fill(in.pixels.length)(1.0)
      def zero(r: Int, c: Int): Unit =
        if (r >= 0 && r < h && c >= 0 && c < w) out(r * w + c) = 0.0
      // vertical lines: seeded per GLOBAL column (tileSize anchors
      // border tiles); thickness spans exactly `size` pixels
      var c = 0
      while (c < w) {
        val gc = in.cellX.toLong * tileSize + c
        if (u01(seed, gc, 0, 6000) < p) {
          val start = (u01(seed, gc, 1, 6001) * h).toInt
          val span = (math.floor(
            (minFrac + u01(seed, gc, 2, 6002) * (maxFrac - minFrac)) * h)).toInt
          val size = minSize +
            (u01(seed, gc, 3, 6003) * (maxSize - minSize + 1)).toInt
          val half = size / 2
          var r = start
          while (r < math.min(start + span, h)) {
            var cc = c - half
            while (cc < c - half + size) { zero(r, cc); cc += 1 }
            r += 1
          }
        }
        c += 1
      }
      // horizontal lines: seeded per GLOBAL row
      var r = 0
      while (r < h) {
        val gr = in.cellY.toLong * tileSize + r
        if (u01(seed, gr, 4, 6004) < p) {
          val start = (u01(seed, gr, 5, 6005) * w).toInt
          val span = (math.floor(
            (minFrac + u01(seed, gr, 6, 6006) * (maxFrac - minFrac)) * w)).toInt
          val size = minSize +
            (u01(seed, gr, 7, 6007) * (maxSize - minSize + 1)).toInt
          val half = size / 2
          var cc = start
          while (cc < math.min(start + span, w)) {
            var rr = r - half
            while (rr < r - half + size) { zero(rr, cc); rr += 1 }
            cc += 1
          }
        }
        r += 1
      }
      in.copy(pixels = out)
    }

  /** Ellipse mask (reference shape_masking.py:12-188): with prob p per
    * patch, zero the points inside a random rotated ellipse
    * (reference's _point_within_elipse test verbatim).
    */
  def maskEllipse(tiles: Dataset[Tile], p: Double,
                  maxHeight: Double = 0.4, maxWidth: Double = 0.4,
                  minHeight: Double = 0.1, minWidth: Double = 0.1,
                  seed: Long = 42L): Dataset[Tile] =
    tiles.map { in =>
      val out = Array.fill(in.pixels.length)(1.0)
      if (u01(seed, in.cellX, in.cellY, 7000) <= p) {
        val h = in.h; val w = in.w
        val cy = u01(seed, in.cellX, in.cellY, 7001) * h
        val cx = u01(seed, in.cellX, in.cellY, 7002) * w
        val a = (minHeight + u01(seed, in.cellX, in.cellY, 7003) * (maxHeight - minHeight)) * h
        val b = (minWidth + u01(seed, in.cellX, in.cellY, 7004) * (maxWidth - minWidth)) * w
        val theta = u01(seed, in.cellX, in.cellY, 7005) * math.Pi
        val ct = math.cos(theta); val st = math.sin(theta)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val dx = c - cx; val dy = r - cy
            val u = dx * ct + dy * st
            val v = dx * st - dy * ct
            if (u * u / (a * a) + v * v / (b * b) <= 1.0) out(r * w + c) = 0.0
            c += 1
          }
          r += 1
        }
      }
      in.copy(pixels = out)
    }

  /** Apply a 0/1 mask plane to a data plane (masked pixels → `fill`). */
  def applyMask(data: Dataset[Tile], mask: Dataset[Tile],
                fill: Double = 0.0): Dataset[Tile] =
    keyJoin(data, mask).map { case (d, m) =>
      val out = new Array[Double](d.pixels.length)
      var i = 0
      while (i < out.length) {
        out(i) = if (m.pixels(i) == 0.0) fill else d.pixels(i)
        i += 1
      }
      d.copy(pixels = out)
    }

  /** Apply a mask with NOISE replacement (reference:
    * buteo/ai/masking/noise.py:13-115): masked pixels become uniform
    * draws in [valMin, valMax] — or, `binary=true`, exactly valMin/valMax
    * by a fair coin. The noise field is keyed on global pixel coords
    * (band-independent, the reference's 2D form).
    */
  def applyMaskNoise(data: Dataset[Tile], mask: Dataset[Tile], tileSize: Int,
                     valMin: Double, valMax: Double,
                     binary: Boolean = false, seed: Long = 42L): Dataset[Tile] =
    keyJoin(data, mask).map { case (d, m) =>
      val out = new Array[Double](d.pixels.length)
      var r = 0
      while (r < d.h) {
        var c = 0
        while (c < d.w) {
          val i = r * d.w + c
          out(i) =
            if (m.pixels(i) != 0.0) d.pixels(i)
            else {
              val u = u01(seed, d.cellX.toLong * tileSize + c,
                d.cellY.toLong * tileSize + r, 8000)
              if (binary) { if (u > 0.5) valMax else valMin }
              else valMin + u * (valMax - valMin)
            }
          c += 1
        }
        r += 1
      }
      d.copy(pixels = out)
    }
}
