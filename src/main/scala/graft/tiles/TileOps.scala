package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{BBox, Polygon, RTree}

/** Dataset-level raster algebra. Every op is a distributed tile transform:
  * narrow where the kernel is tile-local, one stencil shuffle where a halo
  * is needed. No driver-side pixel loops anywhere.
  */
object TileOps {
  import org.apache.spark.sql.Encoders
  implicit val tileEnc: org.apache.spark.sql.Encoder[Tile] = Encoders.product[Tile]

  /** Materialize a raster as a Dataset[Tile] with `value(x, y, band)`
    * filled per global pixel. The analog of raster_create_empty /
    * create_from_array (reference: buteo/core_raster/core_raster_write.py:118,247)
    * — distributed: one task per tile via spark.range.
    */
  def createRaster(spark: SparkSession, spec: RasterSpec)
                  (value: (Int, Int, Int) => Double): Dataset[Tile] = {
    import spark.implicits._
    val tx = spec.tilesX; val ty = spec.tilesY
    spark.range(spec.numTiles.toLong).map { id =>
      val band = (id / (tx * ty)).toInt
      val rem = (id % (tx * ty)).toInt
      val cy = rem / tx; val cx = rem % tx
      val w = spec.tileW(cx); val h = spec.tileH(cy)
      val (ox, oy) = spec.tileOrigin(cx, cy)
      val px = new Array[Double](w * h)
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          px(r * w + c) = value(cx * spec.tileSize + c, cy * spec.tileSize + r, band)
          c += 1
        }
        r += 1
      }
      Tile(cx, cy, band, w, h, ox, oy, spec.pxW, spec.pxH, px, spec.nodata, spec.crs)
    }
  }

  /** Per-tile stats over non-nodata pixels; integer-exact sums (pixels are
    * integral doubles). One narrow pass — no shuffle.
    */
  def tileStats(tiles: Dataset[Tile]): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.map { t =>
      var vmin = Double.MaxValue; var vmax = Double.MinValue
      var sum = 0L; var n = 0L
      var i = 0
      while (i < t.pixels.length) {
        val v = t.pixels(i)
        if (v != t.nodata) {
          if (v < vmin) vmin = v
          if (v > vmax) vmax = v
          sum += v.toLong; n += 1
        }
        i += 1
      }
      (t.cellX, t.cellY, t.band, vmin, vmax, sum, n)
    }.toDF("cell_x", "cell_y", "band", "vmin", "vmax", "vsum", "n_px")
  }

  /** Nearest-neighbor downsample by an integer factor that divides the
    * tile size: each target tile derives from exactly one source tile, so
    * the op is narrow (no shuffle). GDAL-nearest semantics: target pixel
    * takes the source pixel containing its center
    * (reference: buteo/raster/resample.py:29-154, method enum
    * utils_translate.py:293).
    */
  def resampleNearest(tiles: Dataset[Tile], factor: Int): Dataset[Tile] = {
    tiles.map { t =>
      val w2 = t.w / factor; val h2 = t.h / factor
      val out = new Array[Double](w2 * h2)
      var r = 0
      while (r < h2) {
        var c = 0
        while (c < w2) {
          // center of target pixel falls in source pixel (c*f + f/2, r*f + f/2)
          out(r * w2 + c) = t.pixels((r * factor + factor / 2) * t.w + (c * factor + factor / 2))
          c += 1
        }
        r += 1
      }
      Tile(t.cellX, t.cellY, t.band, w2, h2, t.originX, t.originY,
        t.pxW * factor, t.pxH * factor, out, t.nodata, t.crs)
    }
  }

  /** Clip: pixels whose CENTER falls outside the polygon become nodata
    * (all_touch=false semantics of the reference cutline —
    * buteo/raster/clip.py:117-138). Tiles wholly outside the polygon's
    * bbox are filtered before any pixel work (the reference's two-pass
    * prefilter, buteo/raster/grid.py:139-151).
    */
  def clip(tiles: Dataset[Tile], poly: Polygon): Dataset[Tile] = {
    val spark = tiles.sparkSession
    val bc = spark.sparkContext.broadcast(poly)
    val pb = poly.bbox
    tiles
      .filter((t: Tile) => t.bbox.intersects(pb))
      .map { t =>
        val p = bc.value
        val out = new Array[Double](t.pixels.length)
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val (gx, gy) = t.pixelCenter(c, r)
            out(r * t.w + c) = if (p.contains(gx, gy)) t.pixels(r * t.w + c) else t.nodata
            c += 1
          }
          r += 1
        }
        t.copy(pixels = out)
      }
  }

  /** Zonal statistics: per-zone count/sum/min/max over pixels whose center
    * lies in the zone polygon (reference:
    * buteo/raster/zonal_statistics.py:29-129). Tile→zone candidate pairs
    * come from a broadcast R-tree of zone bboxes (no shuffle of pixels;
    * the only shuffle is the final tiny per-zone agg).
    */
  def zonalStats(tiles: Dataset[Tile], zones: Seq[(Long, Polygon)]): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val zoneArr = zones.toArray
    val tree = RTree.build(zoneArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((zoneArr, tree))
    tiles.flatMap { t =>
      val (zs, tr) = bc.value
      val tb = t.bbox
      val cand = tr.query(tb.xMin, tb.xMax, tb.yMin, tb.yMax)
      cand.iterator.flatMap { zi =>
        val (zid, zp) = zs(zi)
        var n = 0L; var sum = 0L
        var vmin = Double.MaxValue; var vmax = Double.MinValue
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val v = t.pixels(r * t.w + c)
            if (v != t.nodata) {
              val (gx, gy) = t.pixelCenter(c, r)
              if (zp.contains(gx, gy)) {
                n += 1; sum += v.toLong
                if (v < vmin) vmin = v
                if (v > vmax) vmax = v
              }
            }
            c += 1
          }
          r += 1
        }
        if (n > 0) Iterator.single((zid, t.band, n, sum, vmin, vmax)) else Iterator.empty
      }
    }.toDF("zone", "band", "n_px", "vsum", "vmin", "vmax")
      .groupBy("zone", "band")
      .agg(sum("n_px").as("n_px"), sum("vsum").as("vsum"),
        min("vmin").as("vmin"), max("vmax").as("vmax"))
  }

  /** Neighborhood convolution with cross-tile halo exchange — the
    * distributed form of the reference's kernels
    * (reference: buteo/array/convolution/base.py:412-549, funcs.py:12-288).
    *
    * Stencil shuffle: every tile is sent to itself + its 8 neighbors keyed
    * by target cell; each group assembles a (w+2r)×(h+2r) padded plane and
    * runs the kernel. Out-of-raster area stays "absent" — methods operate
    * on in-bounds, non-nodata neighbors only (the reference's edge
    * renormalization semantics, convolution/base.py:114-156).
    *
    * `method`: sum | mean | max | min | median (subset of the reference's
    * 19; the dispatch structure admits the rest).
    */
  implicit val padEnc: org.apache.spark.sql.Encoder[(Tile, Array[Double], Int, Int)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  /** Halo exchange: each tile is shipped to itself + its 8 neighbors;
    * every surviving center tile is returned with its (w+2r)×(h+2r)
    * padded plane (NaN = outside raster). The shared stencil primitive
    * behind convolve / bilinear / DEM gradients.
    */
  def convolvePad(tiles: Dataset[Tile], radius: Int): Dataset[(Tile, Array[Double], Int, Int)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val r = radius
    tiles
      .flatMap { t =>
        for (dx <- -1 to 1; dy <- -1 to 1)
          yield ((t.cellX + dx, t.cellY + dy, t.band), t)
      }
      .groupByKey(_._1)
      .flatMapGroups { (key: (Int, Int, Int), it: Iterator[((Int, Int, Int), Tile)]) =>
        val (cx, cy, _) = key
        val pieces = it.map(_._2).toArray
        pieces.find(t => t.cellX == cx && t.cellY == cy) match {
          case None => Iterator.empty // halo destination with no center tile
          case Some(ct) =>
            val pw = ct.w + 2 * r; val ph = ct.h + 2 * r
            val pad = Array.fill(pw * ph)(Double.NaN)
            pieces.foreach { p =>
              // piece origin in padded coords; left/top neighbors abut the
              // center at -p.w/-p.h (their own size), right/bottom at ct.w/ct.h
              val offX = r + ((p.cellX - cx) match {
                case -1 => -p.w; case 0 => 0; case _ => ct.w })
              val offY = r + ((p.cellY - cy) match {
                case -1 => -p.h; case 0 => 0; case _ => ct.h })
              var rr = 0
              while (rr < p.h) {
                var cc = 0
                while (cc < p.w) {
                  val px = offX + cc; val py = offY + rr
                  if (px >= 0 && px < pw && py >= 0 && py < ph)
                    pad(py * pw + px) = p.pixels(rr * p.w + cc)
                  cc += 1
                }
                rr += 1
              }
            }
            Iterator.single((ct, pad, pw, ph))
        }
      }
  }

  def convolve(tiles: Dataset[Tile], radius: Int, method: String,
               weight: (Int, Int) => Double = (_, _) => 1.0): Dataset[Tile] = {
    val r = radius
    convolvePad(tiles, radius)
      .map { case (ct, pad, pw, ph) =>
        {
            val out = new Array[Double](ct.w * ct.h)
            val buf = new Array[Double]((2 * r + 1) * (2 * r + 1))
            var row = 0
            while (row < ct.h) {
              var colI = 0
              while (colI < ct.w) {
                var n = 0; var s = 0.0; var mx = Double.MinValue; var mn = Double.MaxValue
                var dy = -r
                while (dy <= r) {
                  var dx = -r
                  while (dx <= r) {
                    val v = pad((row + r + dy) * pw + (colI + r + dx))
                    if (!v.isNaN && v != ct.nodata) {
                      val wv = v * weight(dx, dy)
                      buf(n) = wv; n += 1; s += wv
                      if (wv > mx) mx = wv
                      if (wv < mn) mn = wv
                    }
                    dx += 1
                  }
                  dy += 1
                }
                // s2 accumulated alongside s for the moment-based methods
                var s2 = 0.0
                var j = 0
                while (j < n) { s2 += buf(j) * buf(j); j += 1 }
                val center = pad((row + r) * pw + (colI + r))
                out(row * ct.w + colI) = method match {
                  case _ if n == 0 => ct.nodata
                  case "sum" => s
                  case "mean" => s / n
                  case "max" => mx
                  case "min" => mn
                  case "roughness" => mx - mn // reference: dem roughness
                  case "variance" => (s2 - s * s / n) / n
                  case "std" => math.sqrt((s2 - s * s / n) / n)
                  case "zscore" => // center relative to hood (σ=0 → 0)
                    if (center.isNaN || center == ct.nodata) ct.nodata
                    else {
                      val v = (s2 - s * s / n) / n
                      if (v == 0.0) 0.0 else (center - s / n) / math.sqrt(v)
                    }
                  case "tpi" => // center minus mean of the other neighbors
                    if (center.isNaN || center == ct.nodata) ct.nodata
                    else if (n <= 1) 0.0
                    else center - (s - center) / (n - 1)
                  case "median" =>
                    val sorted = java.util.Arrays.copyOf(buf, n)
                    java.util.Arrays.sort(sorted)
                    if (n % 2 == 1) sorted(n / 2)
                    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
                  case "quantile25" => // linear interpolation (quantile_cont)
                    val sorted = java.util.Arrays.copyOf(buf, n)
                    java.util.Arrays.sort(sorted)
                    val pos = 0.25 * (n - 1)
                    val lo = math.floor(pos).toInt
                    val hi = math.min(lo + 1, n - 1)
                    sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
                  case "mad" => // median absolute deviation around the hood median
                    val sorted = java.util.Arrays.copyOf(buf, n)
                    java.util.Arrays.sort(sorted)
                    val med = if (n % 2 == 1) sorted(n / 2)
                      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
                    val devs = new Array[Double](n)
                    var jm = 0
                    while (jm < n) { devs(jm) = math.abs(buf(jm) - med); jm += 1 }
                    java.util.Arrays.sort(devs)
                    if (n % 2 == 1) devs(n / 2)
                    else (devs(n / 2 - 1) + devs(n / 2)) / 2.0
                  case "sigma_lee" => // speckle filter: mean of hood values
                    // within 2σ of the center (σ over the full hood)
                    if (center.isNaN || center == ct.nodata) ct.nodata
                    else {
                      val sig = math.sqrt((s2 - s * s / n) / n)
                      val lim = 2.0 * sig
                      var cnt = 0; var acc = 0.0; var j3 = 0
                      while (j3 < n) {
                        if (math.abs(buf(j3) - center) <= lim) { acc += buf(j3); cnt += 1 }
                        j3 += 1
                      }
                      if (cnt == 0) center else acc / cnt
                    }
                  case "occurrences" => // hood values equal to the center
                    if (center.isNaN || center == ct.nodata) ct.nodata
                    else {
                      var cnt = 0; var j2 = 0
                      while (j2 < n) { if (buf(j2) == center) cnt += 1; j2 += 1 }
                      cnt.toDouble
                    }
                  case "mode" => // most frequent; ties → smallest value
                    val sorted = java.util.Arrays.copyOf(buf, n)
                    java.util.Arrays.sort(sorted)
                    var best = sorted(0); var bestCnt = 1
                    var cur = sorted(0); var curCnt = 1
                    var k = 1
                    while (k < n) {
                      if (sorted(k) == cur) curCnt += 1
                      else { cur = sorted(k); curCnt = 1 }
                      if (curCnt > bestCnt) { best = cur; bestCnt = curCnt }
                      k += 1
                    }
                    best
                  case m => throw new IllegalArgumentException(s"unknown method: $m")
                }
                colI += 1
              }
              row += 1
            }
            ct.copy(pixels = out)
        }
      }(tileEnc)
  }

  /** Flatten tiles to (x, y, band, v) global pixel rows (for compact
    * outputs / oracles; not a hot path).
    */
  def toPixels(tiles: Dataset[Tile], tileSize: Int): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.flatMap { t =>
      val baseX = t.cellX * tileSize; val baseY = t.cellY * tileSize
      for (r <- 0 until t.h; c <- 0 until t.w)
        yield (baseX + c, baseY + r, t.band, t.pixels(r * t.w + c))
    }.toDF("x", "y", "band", "v")
  }
}
