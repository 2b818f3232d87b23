package graft.tiles

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset

/** EFolki dense optical-flow coregistration — the reference's
  * coregister/gefolki module (buteo/raster/gefolki.py:363-408 EFolkiIter,
  * rank filter :627-649, separable box window :348-361, bilinear warp
  * :545-550; the algorithm is the published FOLKI/EFolki iterative
  * Lucas–Kanade scheme, Plyer et al. 2015).
  *
  * The kernel is a faithful local port: rank-transform both images
  * (count of window neighbors greater than the center, zero-padded
  * shifts), central-difference gradients of the reference image,
  * then per radius r: box-window structure tensor (Ixx, Iyy, Ixy) and
  * `iteration` rounds of warp → residual → per-pixel 2×2 solve.
  *
  * Distribution: per-tile with a halo — each tile computes flow on its
  * padded plane and keeps the center. Flow dependencies reach ~rank +
  * Σ(iteration·radius), so the halo bounds exactness near tile edges;
  * interior pixels more than `halo` from an edge match the global
  * computation, and spatially smooth flows (the coregistration use
  * case) converge to the same field everywhere. Output: one row per
  * pixel with (u, v).
  */
object Folki {

  /** Rank transform (rank_filter_sup): count of zero-padded shifted
    * neighbors strictly greater than the center, window (2rad+1)².
    */
  def rankFilterSup(img: Array[Double], w: Int, h: Int, rad: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val v = img(r * w + c)
        var cnt = 0.0
        var i = -rad
        while (i <= rad) {
          var j = -rad
          while (j <= rad) {
            val sr = r - i; val sc = c - j
            val s = if (sr >= 0 && sr < h && sc >= 0 && sc < w) img(sr * w + sc) else 0.0
            if (s > v) cnt += 1.0
            j += 1
          }
          i += 1
        }
        out(r * w + c) = cnt
        c += 1
      }
      r += 1
    }
    out
  }

  /** Rank transform (rank_filter_inf): count of zero-padded shifted
    * neighbors strictly LESS than the center — the inverted-contrast
    * counterpart used by GEFolki.
    */
  def rankFilterInf(img: Array[Double], w: Int, h: Int, rad: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val v = img(r * w + c)
        var cnt = 0.0
        var i = -rad
        while (i <= rad) {
          var j = -rad
          while (j <= rad) {
            val sr = r - i; val sc = c - j
            val s = if (sr >= 0 && sr < h && sc >= 0 && sc < w) img(sr * w + sc) else 0.0
            if (s < v) cnt += 1.0
            j += 1
          }
          i += 1
        }
        out(r * w + c) = cnt
        c += 1
      }
      r += 1
    }
    out
  }

  /** Separable zero-padded window SUM (GEFolki's criterion window:
    * conv2SepMatlabbis with an all-ones kernel, gefolki.py:520-521).
    */
  def boxSum(img: Array[Double], w: Int, h: Int, rad: Int): Array[Double] = {
    val tmp = new Array[Double](w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var s = 0.0
        var j = math.max(0, c - rad)
        val jEnd = math.min(w - 1, c + rad)
        while (j <= jEnd) { s += img(r * w + j); j += 1 }
        tmp(r * w + c) = s
        c += 1
      }
      r += 1
    }
    val out = new Array[Double](w * h)
    var c = 0
    while (c < w) {
      var r2 = 0
      while (r2 < h) {
        var s = 0.0
        var i = math.max(0, r2 - rad)
        val iEnd = math.min(h - 1, r2 + rad)
        while (i <= iEnd) { s += tmp(i * w + c); i += 1 }
        out(r2 * w + c) = s
        r2 += 1
      }
      c += 1
    }
    out
  }

  /** np.gradient: central differences interior, one-sided at edges.
    * Returns (ddRow, ddCol) = (Iy, Ix).
    */
  def gradient(img: Array[Double], w: Int, h: Int): (Array[Double], Array[Double]) = {
    val gy = new Array[Double](w * h)
    val gx = new Array[Double](w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        gy(r * w + c) =
          if (h == 1) 0.0
          else if (r == 0) img(w + c) - img(c)
          else if (r == h - 1) img(r * w + c) - img((r - 1) * w + c)
          else (img((r + 1) * w + c) - img((r - 1) * w + c)) * 0.5
        gx(r * w + c) =
          if (w == 1) 0.0
          else if (c == 0) img(r * w + 1) - img(r * w)
          else if (c == w - 1) img(r * w + c) - img(r * w + c - 1)
          else (img(r * w + c + 1) - img(r * w + c - 1)) * 0.5
        c += 1
      }
      r += 1
    }
    (gy, gx)
  }

  /** Separable zero-padded box mean, each axis divided by (2rad+1)
    * (conv2SepMatlabbis with burt1D = ones/(2rad+1)).
    */
  def boxWindow(img: Array[Double], w: Int, h: Int, rad: Int): Array[Double] = {
    val n = (2 * rad + 1).toDouble
    val tmp = new Array[Double](w * h)
    var r = 0
    while (r < h) { // horizontal pass
      var c = 0
      while (c < w) {
        var s = 0.0
        var j = math.max(0, c - rad)
        val jEnd = math.min(w - 1, c + rad)
        while (j <= jEnd) { s += img(r * w + j); j += 1 }
        tmp(r * w + c) = s / n
        c += 1
      }
      r += 1
    }
    val out = new Array[Double](w * h)
    var c = 0
    while (c < w) { // vertical pass
      var r2 = 0
      while (r2 < h) {
        var s = 0.0
        var i = math.max(0, r2 - rad)
        val iEnd = math.min(h - 1, r2 + rad)
        while (i <= iEnd) { s += tmp(i * w + c); i += 1 }
        out(r2 * w + c) = s / n
        r2 += 1
      }
      c += 1
    }
    out
  }

  /** Bilinear sample with coordinate clamping (interp2 order=1,
    * mode='nearest').
    */
  def interp2(img: Array[Double], w: Int, h: Int, x: Double, y: Double): Double = {
    val cx = math.max(0.0, math.min(w - 1.0, x))
    val cy = math.max(0.0, math.min(h - 1.0, y))
    val x0 = math.floor(cx).toInt; val y0 = math.floor(cy).toInt
    val x1 = math.min(w - 1, x0 + 1); val y1 = math.min(h - 1, y0 + 1)
    val fx = cx - x0; val fy = cy - y0
    val a = img(y0 * w + x0) * (1 - fx) + img(y0 * w + x1) * fx
    val b = img(y1 * w + x0) * (1 - fx) + img(y1 * w + x1) * fx
    a * (1 - fy) + b * fy
  }

  /** EFolkiIter port. Returns (u, v) displacement planes: I1 sampled at
    * (x + u, y + v) matches I0.
    */
  def efolki(i0In: Array[Double], i1In: Array[Double], w: Int, h: Int,
             iteration: Int = 5, radii: Seq[Int] = Seq(8, 4),
             rank: Int = 4, uinit: Array[Double] = null,
             vinit: Array[Double] = null): (Array[Double], Array[Double]) = {
    val talon = 1e-8
    val i0 = if (rank > 0) rankFilterSup(i0In, w, h, rank) else i0In
    val i1 = if (rank > 0) rankFilterSup(i1In, w, h, rank) else i1In
    val u = if (uinit != null) uinit.clone() else new Array[Double](w * h)
    val v = if (vinit != null) vinit.clone() else new Array[Double](w * h)
    val (iy, ix) = gradient(i0, w, h)
    val ixix = ix.zip(ix).map { case (a, b) => a * b }
    val iyiy = iy.zip(iy).map { case (a, b) => a * b }
    val ixiy = ix.zip(iy).map { case (a, b) => a * b }
    radii.foreach { rad =>
      val ixx = boxWindow(ixix, w, h, rad).map(_ + talon)
      val iyy = boxWindow(iyiy, w, h, rad).map(_ + talon)
      val ixy = boxWindow(ixiy, w, h, rad)
      val d = new Array[Double](w * h)
      var i = 0
      while (i < d.length) { d(i) = ixx(i) * iyy(i) - ixy(i) * ixy(i); i += 1 }
      var it = 0
      while (it < iteration) {
        val res = new Array[Double](w * h)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val k = r * w + c
            val i1w = interp2(i1, w, h, c + u(k), r + v(k))
            res(k) = i0(k) - i1w + u(k) * ix(k) + v(k) * iy(k)
            c += 1
          }
          r += 1
        }
        val ixt = boxWindow(res.zip(ix).map { case (a, b) => a * b }, w, h, rad)
        val iyt = boxWindow(res.zip(iy).map { case (a, b) => a * b }, w, h, rad)
        i = 0
        while (i < u.length) {
          val nu = (iyy(i) * ixt(i) - ixy(i) * iyt(i)) / d(i)
          val nv = (ixx(i) * iyt(i) - ixy(i) * ixt(i)) / d(i)
          u(i) = if (nu.isNaN || nu.isInfinite) 0.0 else nu
          v(i) = if (nv.isNaN || nv.isInfinite) 0.0 else nv
          i += 1
        }
        it += 1
      }
    }
    (u, v)
  }

  /** GEFolkiIter port (gefolki.py:431-540) — multi-sensor flow where the
    * target may have locally INVERTED contrast (SAR↔optical): both images
    * are CLAHE-equalized (graft.tiles.Clahe — including the write-back
    * fix for the vendored no-op bug, see Clahe's doc), the reference
    * image is rank-sup transformed, and each iteration warps BOTH the
    * rank-sup and rank-inf transforms of the target, choosing per pixel
    * whichever the local equalized-residual criterion prefers
    * (crit |H0−H1w| vs |1−H0−H1w| summed over the rank window).
    *
    * Inputs must be in [0,1] (BurtOF normalizes before calling; the
    * equalization chain quantizes through uint8). Any width/height is
    * accepted: planes that are not a multiple of 16 (8 CLAHE tiles ×
    * even region size) are bilinearly resized up for the equalization
    * and resized back, with a post-resize /max renormalization — the
    * reference's own resize-to-multiple-of-8 branch
    * (gefolki.py:441-459,464-482). Flow runs at the ORIGINAL
    * resolution; only the CLAHE input takes the resize detour, exactly
    * as in the reference.
    */
  /** Bilinear resample to (tw, th) — pixel-center mapping with edge
    * clamp (skimage.transform.resize order=1 geometry).
    */
  private def bilinearResize(img: Array[Double], w: Int, h: Int,
                             tw: Int, th: Int): Array[Double] = {
    if (tw == w && th == h) return img
    val out = new Array[Double](tw * th)
    val sx = w.toDouble / tw; val sy = h.toDouble / th
    var r = 0
    while (r < th) {
      val fy = (r + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(h - 1, math.floor(fy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var c = 0
      while (c < tw) {
        val fx = (c + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(w - 1, math.floor(fx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        val top = img(y0 * w + x0) * (1 - wx) + img(y0 * w + x1) * wx
        val bot = img(y1 * w + x0) * (1 - wx) + img(y1 * w + x1) * wx
        out(r * tw + c) = top * (1 - wy) + bot * wy
        c += 1
      }
      r += 1
    }
    out
  }

  /** CLAHE equalization for ANY plane size: the reference's
    * resize-to-multiple branch (gefolki.py GEFolkiIter) — resize up to
    * the next multiple of 16 (8 tiles × even region), equalize, resize
    * back, renormalize by max through float32 like the reference.
    */
  private def equalizeAnySize(img: Array[Double], w: Int, h: Int): Array[Double] = {
    if (w % 16 == 0 && h % 16 == 0) return Clahe.equalizeChain(img, w, h)
    val tw = ((w + 15) / 16) * 16
    val th = ((h + 15) / 16) * 16
    val eq = Clahe.equalizeChain(bilinearResize(img, w, h, tw, th), tw, th)
    val back = bilinearResize(eq, tw, th, w, h)
    var mx = 0.0
    back.foreach(v => if (v > mx) mx = v)
    if (mx > 0) back.map(v => (v.toFloat / mx.toFloat).toDouble) else back
  }

  def gefolki(i0: Array[Double], i1: Array[Double], w: Int, h: Int,
              iteration: Int = 5, radii: Seq[Int] = Seq(8, 4),
              rank: Int = 4, uinit: Array[Double] = null,
              vinit: Array[Double] = null): (Array[Double], Array[Double]) = {
    val r0 = rankFilterSup(i0, w, h, rank)
    val r1i = rankFilterInf(i1, w, h, rank)
    val r1s = rankFilterSup(i1, w, h, rank)
    val h0 = equalizeAnySize(i0, w, h)
    val h1 = equalizeAnySize(i1, w, h)
    val u = if (uinit != null) uinit.clone() else new Array[Double](w * h)
    val v = if (vinit != null) vinit.clone() else new Array[Double](w * h)
    val (iy, ix) = gradient(r0, w, h)
    val ixix = Array.tabulate(w * h)(k => ix(k) * ix(k))
    val iyiy = Array.tabulate(w * h)(k => iy(k) * iy(k))
    val ixiy = Array.tabulate(w * h)(k => ix(k) * iy(k))
    radii.foreach { rad =>
      val ixx = boxWindow(ixix, w, h, rad)
      val iyy = boxWindow(iyiy, w, h, rad)
      val ixy = boxWindow(ixiy, w, h, rad)
      val d = Array.tabulate(w * h)(k => ixx(k) * iyy(k) - ixy(k) * ixy(k))
      var it = 0
      while (it < iteration) {
        val h1w = new Array[Double](w * h)
        val res = new Array[Double](w * h)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val k = r * w + c
            h1w(k) = interp2(h1, w, h, c + u(k), r + v(k))
            c += 1
          }
          r += 1
        }
        val crit1 = boxSum(Array.tabulate(w * h)(k => math.abs(h0(k) - h1w(k))), w, h, rank)
        val crit2 = boxSum(Array.tabulate(w * h)(k => math.abs(1.0 - h0(k) - h1w(k))), w, h, rank)
        r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val k = r * w + c
            val warped =
              if (crit1(k) > crit2(k)) interp2(r1i, w, h, c + u(k), r + v(k))
              else interp2(r1s, w, h, c + u(k), r + v(k))
            res(k) = r0(k) - warped + u(k) * ix(k) + v(k) * iy(k)
            c += 1
          }
          r += 1
        }
        val ixt = boxWindow(Array.tabulate(w * h)(k => res(k) * ix(k)), w, h, rad)
        val iyt = boxWindow(Array.tabulate(w * h)(k => res(k) * iy(k)), w, h, rad)
        var k = 0
        while (k < u.length) {
          val nu = (iyy(k) * ixt(k) - ixy(k) * iyt(k)) / d(k)
          val nv = (ixx(k) * iyt(k) - ixy(k) * ixt(k)) / d(k)
          u(k) = if (nu.isNaN || nu.isInfinite) 0.0 else nu
          v(k) = if (nv.isNaN || nv.isInfinite) 0.0 else nv
          k += 1
        }
        it += 1
      }
    }
    (u, v)
  }

  /** Burt 5-tap downsample (BurtOF.pyrUp, gefolki.py:608-616): separable
    * zero-padded conv with [1/4−a/2, 1/4, a, 1/4, 1/4−a/2], a=0.4, then
    * every-2nd-pixel decimation. Returns (plane, w2, h2).
    */
  def burtDown(img: Array[Double], w: Int, h: Int): (Array[Double], Int, Int) = {
    val a = 0.4
    val k = Array(0.25 - a / 2, 0.25, a, 0.25, 0.25 - a / 2)
    val tmp = new Array[Double](w * h)
    var r = 0
    while (r < h) { // horizontal
      var c = 0
      while (c < w) {
        var s = 0.0
        var j = -2
        while (j <= 2) {
          val cc = c + j
          if (cc >= 0 && cc < w) s += k(j + 2) * img(r * w + cc)
          j += 1
        }
        tmp(r * w + c) = s
        c += 1
      }
      r += 1
    }
    val full = new Array[Double](w * h)
    var c = 0
    while (c < w) { // vertical
      var r2 = 0
      while (r2 < h) {
        var s = 0.0
        var j = -2
        while (j <= 2) {
          val rr = r2 + j
          if (rr >= 0 && rr < h) s += k(j + 2) * tmp(rr * w + c)
          j += 1
        }
        full(r2 * w + c) = s
        r2 += 1
      }
      c += 1
    }
    val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
    val out = new Array[Double](w2 * h2)
    r = 0
    while (r < h2) {
      var c2 = 0
      while (c2 < w2) { out(r * w2 + c2) = full(2 * r * w + 2 * c2); c2 += 1 }
      r += 1
    }
    (out, w2, h2)
  }

  /** Flow upscale (BurtOF.pyrDown, gefolki.py:617-626): nearest 2×2
    * repeat clipped/zero-padded to the target shape. Values are NOT
    * scaled here — the caller multiplies by 2 as the reference does.
    */
  def flowUp(f: Array[Double], w: Int, h: Int, tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var r = 0
    while (r < math.min(th, 2 * h)) {
      var c = 0
      while (c < math.min(tw, 2 * w)) {
        out(r * tw + c) = f((r / 2) * w + (c / 2))
        c += 1
      }
      r += 1
    }
    out
  }

  /** Coarse-to-fine EFolki (BurtOF wrapper, gefolki.py:561-592): both
    * images min-max normalized, Burt pyramid of `levels` reductions,
    * flow solved coarsest-first and upscaled (×2 values) as the init of
    * the next level — this is what captures displacements beyond the
    * window radius.
    */
  def efolkiPyramid(i0In: Array[Double], i1In: Array[Double], w: Int, h: Int,
                    levels: Int = 4, iteration: Int = 5,
                    radii: Seq[Int] = Seq(8, 4),
                    rank: Int = 4): (Array[Double], Array[Double]) = {
    def normalize(img: Array[Double]): Array[Double] = {
      var mn = Double.MaxValue; var mx = Double.MinValue
      img.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
      val span = if (mx > mn) mx - mn else 1.0
      img.map(x => (x - mn) / span)
    }
    var py0 = List((normalize(i0In), w, h))
    var py1 = List((normalize(i1In), w, h))
    var l = 0
    while (l < levels) {
      val (p0, w0, h0) = py0.head
      val (p1, _, _) = py1.head
      py0 = burtDown(p0, w0, h0) :: py0
      py1 = burtDown(p1, w0, h0) :: py1
      l += 1
    }
    // py0.head is now the coarsest level
    var u = new Array[Double](py0.head._2 * py0.head._3)
    var v = new Array[Double](u.length)
    var levelsList = py0.zip(py1)
    while (levelsList.nonEmpty) {
      val (((p0, lw, lh), (p1, _, _))) = levelsList.head
      val (nu, nv) = efolki(p0, p1, lw, lh, iteration, radii, rank, u, v)
      levelsList = levelsList.tail
      if (levelsList.nonEmpty) {
        val (_, tw, th) = levelsList.head._1
        u = flowUp(nu, lw, lh, tw, th).map(_ * 2.0)
        v = flowUp(nv, lw, lh, tw, th).map(_ * 2.0)
      } else { u = nu; v = nv }
    }
    (u, v)
  }

  /** Distributed coregistration: flow of `target` onto `ref` per tile
    * with a `halo`-pixel context (one halo exchange per raster, one
    * key join). Output rows: (x, y, band, u, v).
    */
  def coregister(ref: Dataset[Tile], target: Dataset[Tile], spec: RasterSpec,
                 halo: Int, iteration: Int = 5, radii: Seq[Int] = Seq(8, 4),
                 rank: Int = 4, levels: Int = 0): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    val ts = spec.tileSize
    val p0 = TileOps.convolvePad(ref, halo).map { case (t, pad, pw, ph) =>
      ((t.cellX, t.cellY, t.band), (t, pad, pw, ph))
    }
    val p1 = TileOps.convolvePad(target, halo).map { case (t, pad, pw, ph) =>
      ((t.cellX, t.cellY, t.band), pad)
    }
    p0.joinWith(p1, p0("_1") === p1("_1"))
      .flatMap { case (((_, (t, pad0, pw, ph))), (_, pad1)) =>
        // NaN halo (outside the raster) → 0, matching the reference's
        // zero-padded shifts at image borders
        val a0 = pad0.map(x => if (x.isNaN) 0.0 else x)
        val a1 = pad1.map(x => if (x.isNaN) 0.0 else x)
        val (u, v) =
          if (levels > 0) efolkiPyramid(a0, a1, pw, ph, levels, iteration, radii, rank)
          else efolki(a0, a1, pw, ph, iteration, radii, rank)
        val baseX = t.cellX * ts; val baseY = t.cellY * ts
        for (r <- 0 until t.h; c <- 0 until t.w) yield {
          val k = (r + halo) * pw + (c + halo)
          (baseX + c, baseY + r, t.band, u(k), v(k))
        }
      }
      .toDF("x", "y", "band", "u", "v")
  }
}
