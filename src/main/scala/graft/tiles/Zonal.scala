package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.geo.{Polygon, RTree}

/** Full zonal-statistics enum — the reference's 21-stat list
  * (reference: buteo/vector/zonal_statistics.py:35-63 — count, range,
  * min, max, sum, mean, var, std, skew, kurtosis, median, iqr, q02, q98,
  * q1, q3, mad, mode, snr, eff, cv; active-path subset mean/median/std/
  * min/max/sum at buteo/raster/zonal_statistics.py:29-60).
  *
  * Distribution shape: pixels never shuffle. Each tile builds LOCAL
  * per-(zone, value) histograms against the broadcast zone R-tree; one
  * shuffle aggregates histograms per (zone, band, value); a second tiny
  * groupBy folds each zone's histogram into all 21 statistics at once.
  * Order statistics (median/quantiles/mad/mode) are EXACT because they
  * are computed from the full value histogram — the right plan when the
  * value domain is bounded (categorical/integral rasters; for unbounded
  * continuous payloads swap the histogram for percentile_approx).
  *
  * Moment statistics come from exact integer power sums (Σv..Σv⁴);
  * quantiles use linear interpolation at q·(n−1) (np.percentile
  * 'linear', the reference's numpy semantics).
  */
final case class ZonalFullRow(
    zone: Long, band: Int, n_px: Long, vmin: Double, vmax: Double,
    vsum: Double, vrange: Double, mean: Double, variance: Double,
    std: Double, skew: Double, kurtosis: Double, median: Double,
    q02: Double, q1: Double, q3: Double, q98: Double, iqr: Double,
    mad: Double, mode: Double, snr: Double, eff: Double, cv: Double)

object Zonal {

  /** value-at-index over a cumulative histogram: first v with cum > i. */
  private def at(vs: Array[Double], cum: Array[Long], i: Long): Double = {
    var j = 0
    while (cum(j) <= i) j += 1
    vs(j)
  }

  /** Public access for other histogram-quantile users (Scalers). */
  def histQuantilePublic(vs: Array[Double], cum: Array[Long], n: Long, q: Double): Double =
    histQuantile(vs, cum, n, q)

  /** np.percentile 'linear': interpolate at q·(n−1). */
  private def histQuantile(vs: Array[Double], cum: Array[Long], n: Long, q: Double): Double = {
    val pos = q * (n - 1)
    val lo = math.floor(pos).toLong
    val frac = pos - lo
    val vlo = at(vs, cum, lo)
    if (frac == 0.0) vlo else vlo + (at(vs, cum, lo + 1) - vlo) * frac
  }

  def zonalStatsFull(tiles: Dataset[Tile], zones: Seq[(Long, Polygon)]): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val zoneArr = zones.toArray
    val tree = RTree.build(zoneArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((zoneArr, tree))

    // per-tile local histograms → (zone, band, v, cnt)
    val hist = tiles.flatMap { t =>
      val (zs, tr) = bc.value
      val tb = t.bbox
      val cand = tr.query(tb.xMin, tb.xMax, tb.yMin, tb.yMax)
      val m = collection.mutable.HashMap.empty[(Long, Double), Long]
      var ci = 0
      while (ci < cand.length) {
        val (zid, zp) = zs(cand(ci))
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val v = t.pixels(r * t.w + c)
            if (v != t.nodata) {
              val (gx, gy) = t.pixelCenter(c, r)
              if (zp.contains(gx, gy)) {
                val k = (zid, v)
                m(k) = m.getOrElse(k, 0L) + 1L
              }
            }
            c += 1
          }
          r += 1
        }
        ci += 1
      }
      m.iterator.map { case ((zid, v), cnt) => (zid, t.band, v, cnt) }
    }.toDF("zone", "band", "v", "cnt")
      .groupBy("zone", "band", "v").agg(sum("cnt").as("cnt"))

    // fold each zone's histogram into the full stat row
    hist.as[(Long, Int, Double, Long)]
      .groupByKey { case (zone, band, _, _) => (zone, band) }
      .mapGroups { (key: (Long, Int), it: Iterator[(Long, Int, Double, Long)]) =>
        val (zone, band) = key
        val rows = it.toArray.sortBy(_._3)
        val vs = rows.map(_._3)
        val cnts = rows.map(_._4)
        val cum = cnts.scanLeft(0L)(_ + _).drop(1)
        val n = cum.last
        var s1 = 0.0; var s2 = 0.0; var s3 = 0.0; var s4 = 0.0
        var i = 0
        while (i < vs.length) {
          val v = vs(i); val c = cnts(i).toDouble
          val v2 = v * v
          s1 += c * v; s2 += c * v2; s3 += c * v2 * v; s4 += c * v2 * v2
          i += 1
        }
        val vmin = vs.head; val vmax = vs.last
        val mean = s1 / n
        val variance = (s2 - s1 * s1 / n) / n
        val std = math.sqrt(variance)
        val m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
        val skew = m3 / (std * std * std)
        val m4 = s4 / n - 4.0 * mean * (s3 / n) + 6.0 * mean * mean * (s2 / n) -
          3.0 * mean * mean * mean * mean
        val kurtosis = m4 / (variance * variance)
        val median = histQuantile(vs, cum, n, 0.5)
        val q02 = histQuantile(vs, cum, n, 0.02)
        val q1 = histQuantile(vs, cum, n, 0.25)
        val q3 = histQuantile(vs, cum, n, 0.75)
        val q98 = histQuantile(vs, cum, n, 0.98)
        // mad: weighted median of |v - median| over the deviation histogram
        val devAgg = collection.mutable.HashMap.empty[Double, Long]
        i = 0
        while (i < vs.length) {
          val d = math.abs(vs(i) - median)
          devAgg(d) = devAgg.getOrElse(d, 0L) + cnts(i)
          i += 1
        }
        val devRows = devAgg.toArray.sortBy(_._1)
        val dvs = devRows.map(_._1)
        val dcum = devRows.map(_._2).scanLeft(0L)(_ + _).drop(1)
        val mad = histQuantile(dvs, dcum, n, 0.5)
        // mode: highest count, ties → smallest value
        var mode = vs(0); var bestCnt = cnts(0)
        i = 1
        while (i < vs.length) {
          if (cnts(i) > bestCnt) { bestCnt = cnts(i); mode = vs(i) }
          i += 1
        }
        ZonalFullRow(zone, band, n, vmin, vmax, s1, vmax - vmin, mean,
          variance, std, skew, kurtosis, median, q02, q1, q3, q98, q3 - q1,
          mad, mode, mean / std, variance / (mean * mean), std / mean)
      }
      .toDF()
  }

  /** Zonal statistics for CONTINUOUS rasters: the histogram plan above
    * degenerates to one row per pixel when every value is distinct, and
    * its per-zone fold then holds a whole zone's values in one task.
    * This variant keeps the same zone assignment but computes
    *  - moments (n/min/max/sum/mean/var/std/skew/kurt, snr/eff/cv)
    *    EXACTLY from power sums — a plain map-side-combined hash
    *    aggregate, and
    *  - order statistics (median/q02/q1/q3/q98/iqr, and mad = median of
    *    |v − median| in a second small pass) with percentile_approx
    *    (Greenwald–Khanna sketches, partial-merged per partition),
    * so no task ever materializes a zone's value set. `mode` is omitted:
    * it is not meaningful for continuous data (use zonalStatsFull on
    * categorical rasters). Reference stat enum:
    * buteo/vector/zonal_statistics.py:35-63.
    */
  def zonalStatsApprox(tiles: Dataset[Tile], zones: Seq[(Long, Polygon)],
                       accuracy: Int = 10000): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val zoneArr = zones.toArray
    val tree = RTree.build(zoneArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((zoneArr, tree))

    val px = tiles.flatMap { t =>
      val (zs, tr) = bc.value
      val tb = t.bbox
      val cand = tr.query(tb.xMin, tb.xMax, tb.yMin, tb.yMax)
      val out = collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
      var ci = 0
      while (ci < cand.length) {
        val (zid, zp) = zs(cand(ci))
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val v = t.pixels(r * t.w + c)
            if (v != t.nodata) {
              val (gx, gy) = t.pixelCenter(c, r)
              if (zp.contains(gx, gy)) out += ((zid, t.band, v))
            }
            c += 1
          }
          r += 1
        }
        ci += 1
      }
      out.iterator
    }.toDF("zone", "band", "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val qs = percentile_approx(col("v"),
      array(lit(0.02), lit(0.25), lit(0.5), lit(0.75), lit(0.98)), lit(accuracy))
    val agg = px.groupBy("zone", "band").agg(
      count(lit(1)).as("n_px"), min("v").as("vmin"), max("v").as("vmax"),
      sum("v").as("vsum"), sum(col("v") * col("v")).as("s2"),
      sum(col("v") * col("v") * col("v")).as("s3"),
      sum(col("v") * col("v") * col("v") * col("v")).as("s4"),
      qs.as("q"))
    val stats = agg.select(col("zone"), col("band"), col("n_px"),
        col("vmin"), col("vmax"), col("vsum"),
        (col("vmax") - col("vmin")).as("vrange"),
        (col("vsum") / col("n_px")).as("mean"),
        col("s2"), col("s3"), col("s4"),
        col("q")(0).as("q02"), col("q")(1).as("q1"), col("q")(2).as("median"),
        col("q")(3).as("q3"), col("q")(4).as("q98"))
      .withColumn("variance",
        (col("s2") - col("vsum") * col("vsum") / col("n_px")) / col("n_px"))
      .withColumn("std", sqrt(col("variance")))
      .withColumn("skew",
        (col("s3") / col("n_px") - lit(3.0) * col("mean") * (col("s2") / col("n_px"))
          + lit(2.0) * col("mean") * col("mean") * col("mean"))
          / (col("std") * col("std") * col("std")))
      .withColumn("kurtosis",
        (col("s4") / col("n_px") - lit(4.0) * col("mean") * (col("s3") / col("n_px"))
          + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n_px"))
          - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
          / (col("variance") * col("variance")))
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("snr", col("mean") / col("std"))
      .withColumn("eff", col("variance") / (col("mean") * col("mean")))
      .withColumn("cv", col("std") / col("mean"))
      .drop("s2", "s3", "s4")

    val mad = px
      .join(broadcast(stats.select(col("zone"), col("band"), col("median"))),
        Seq("zone", "band"))
      .groupBy("zone", "band")
      .agg(percentile_approx(abs(col("v") - col("median")), lit(0.5),
        lit(accuracy)).as("mad"))
    stats.join(mad, Seq("zone", "band"))
      .select("zone", "band", "n_px", "vmin", "vmax", "vsum", "vrange",
        "mean", "variance", "std", "skew", "kurtosis", "median", "q02",
        "q1", "q3", "q98", "iqr", "mad", "snr", "eff", "cv")
  }

  /** Binned mode for CONTINUOUS rasters — GDAL's approx-histogram mode
    * (256 equal-width bins between the zone's min/max; mode = center of
    * the fullest bin, ties to the lowest bin). Fills the gap
    * zonalStatsApprox documents: exact `mode` is undefined for
    * continuous data, the binned form is the standard approximation
    * (reference stat enum: buteo/vector/zonal_statistics.py:35-63).
    * Two distributed passes over the zone-pixel plane, never a value
    * set on one node.
    */
  def zonalBinnedMode(tiles: Dataset[Tile], zones: Seq[(Long, Polygon)],
                      bins: Int = 256): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = tiles.sparkSession
    val zoneArr = zones.toArray
    val tree = RTree.build(zoneArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((zoneArr, tree))
    import spark.implicits._
    val px = tiles.flatMap { t =>
      val (zs, tr) = bc.value
      val tb = t.bbox
      val cand = tr.query(tb.xMin, tb.xMax, tb.yMin, tb.yMax)
      val out = collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
      var ci = 0
      while (ci < cand.length) {
        val (zid, zp) = zs(cand(ci))
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val v = t.pixels(r * t.w + c)
            if (v != t.nodata) {
              val (gx, gy) = t.pixelCenter(c, r)
              if (zp.contains(gx, gy)) out += ((zid, t.band, v))
            }
            c += 1
          }
          r += 1
        }
        ci += 1
      }
      out.iterator
    }.toDF("zone", "band", "v")
    // no persist: the plane is scanned twice (ranges, then binning), but
    // caching it would leak MEMORY_AND_DISK partitions for the session
    // lifetime (the returned DataFrame is consumed lazily, so there is
    // no safe point to unpersist inside this function)
    val ranges = px.groupBy("zone", "band")
      .agg(min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("n_px"))
    val binned = px.join(broadcast(ranges), Seq("zone", "band"))
      .withColumn("bin",
        when(col("vmax") === col("vmin"), lit(0)).otherwise(
          least(floor((col("v") - col("vmin")) / (col("vmax") - col("vmin"))
            * lit(bins)).cast("int"), lit(bins - 1))))
      .groupBy("zone", "band", "bin").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("zone", "band")
      .orderBy(col("cnt").desc, col("bin").asc)
    binned.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(broadcast(ranges), Seq("zone", "band"))
      .select(col("zone"), col("band"), col("n_px"), col("bin"), col("cnt"),
        (col("vmin") + (col("bin").cast("double") + lit(0.5))
          * (col("vmax") - col("vmin")) / lit(bins)).as("mode_binned"))
  }

  /** AREA-WEIGHTED zonal statistics — the exactextract / GDAL
    * `-weighted` upgrade over center-in-cell sampling: each pixel
    * contributes `|zone ∩ cell| / |cell|` of its value, so a boundary
    * cell that is 30% covered weighs 0.3 instead of the all-or-nothing
    * center test (reference's zonal path is center-in:
    * buteo/vector/zonal_statistics.py:141-162; this is its published
    * refinement). Coverage comes from the exact Sutherland–Hodgman clip
    * + shoelace kernel (geo/ClipArea) — on dyadic-aligned zones every
    * fraction, product, and partial sum is an exact binary fraction, so
    * the result is bit-identical at any parallelism.
    *
    * Distribution shape: pixels never shuffle. The zone R-tree
    * broadcasts; each tile scans only the pixel index window of
    * zone-bbox ∩ tile; one map-side-combined shuffle aggregates the
    * per-(zone, band) partials (n_cells, Σfrac, Σfrac·v).
    */
  def zonalWeighted(tiles: Dataset[Tile], zones: Seq[(Long, Polygon)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = tiles.sparkSession
    import spark.implicits._
    val zoneArr = zones.toArray
    val tree = RTree.build(zoneArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((zoneArr, tree))

    val partials = tiles.flatMap { t =>
      val (zs, tr) = bc.value
      val tb = t.bbox
      val cand = tr.query(tb.xMin, tb.xMax, tb.yMin, tb.yMax)
      val cellArea = math.abs(t.pxW * t.pxH)
      val out = collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double, Double)]
      var ci = 0
      while (ci < cand.length) {
        val (zid, zp) = zs(cand(ci))
        val zb = zp.bbox
        // pixel index window of zone-bbox ∩ tile (pxH < 0: y grows down)
        val colLo = math.max(0, math.floor((zb.xMin - t.originX) / t.pxW).toInt)
        val colHi = math.min(t.w - 1, math.ceil((zb.xMax - t.originX) / t.pxW).toInt)
        val rowLo = math.max(0, math.floor((zb.yMax - t.originY) / t.pxH).toInt)
        val rowHi = math.min(t.h - 1, math.ceil((zb.yMin - t.originY) / t.pxH).toInt)
        var nCells = 0L; var cov = 0.0; var wsum = 0.0
        var r = rowLo
        while (r <= rowHi) {
          val gy1 = t.originY + r * t.pxH       // cell top
          val gy0 = t.originY + (r + 1) * t.pxH // cell bottom
          var c = colLo
          while (c <= colHi) {
            val v = t.pixels(r * t.w + c)
            if (v != t.nodata && !v.isNaN) {
              val gx0 = t.originX + c * t.pxW
              val a = graft.geo.ClipArea.intersectionArea(
                zp, gx0, gy0, gx0 + t.pxW, gy1)
              if (a > 0.0) {
                val frac = a / cellArea
                nCells += 1L; cov += frac; wsum += frac * v
              }
            }
            c += 1
          }
          r += 1
        }
        if (nCells > 0) out += ((zid, t.band, nCells, cov, wsum))
        ci += 1
      }
      out.iterator
    }.toDF("zone", "band", "n_cells", "cov", "wsum")

    partials.groupBy("zone", "band")
      .agg(sum("n_cells").as("n_cells"), sum("cov").as("cov_px"),
        sum("wsum").as("wsum"))
      .withColumn("wmean", col("wsum") / col("cov_px"))
  }
}
