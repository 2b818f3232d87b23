package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.index.GridCell

/** Distance-within (radius) join: all targets within a fixed planar radius
  * of each probe point, the third member of the spatial-join family next to
  * PIP ([[SpatialJoins]]) and kNN ([[KnnJoin]]) — the reference's
  * proximity/buffer-select idiom (buteo/vector/metrics.py distance checks,
  * buteo/raster/proximity.py) re-expressed as one broadcast equi-join.
  *
  * Scale shape: the probe set is small (a POI table); each probe expands
  * driver-side into the grid cells covering its radius box (a few dozen
  * cells), and that (probe_id, cell) cover BROADCASTS as an equi-join index
  * against the targets' cell id — the big side is never shuffled and never
  * sees a theta-join. Covers at one level are disjoint and each target owns
  * exactly one cell there, so a (probe, target) candidate appears at most
  * once: no distinct needed, output is verify-filtered candidates.
  *
  * The metric is squared euclidean distance on integer microdegree
  * coordinates (planar, no dateline wrap — documented, same contract as
  * [[KnnJoin]]): exact 64-bit arithmetic, bit-reproducible against any
  * engine, which lets a brute-force SQL oracle certify the cell prefilter
  * lossless end-to-end.
  */
object RangeJoin {

  /** targets/probes: (id long, x long, y long) in integer microdegrees.
    * Returns (probe_id, target_id, dist2) for every target with
    * dist2 = (dx² + dy²) <= radiusUdeg² (self-pairs included when a probe
    * is also a target — "within radius" semantics).
    *
    * `level` picks the prefilter cell size; any level is CORRECT (the
    * cover is always a superset — cell ranges derive monotonically from
    * the radius box and get a one-cell safety pad), finer levels trade
    * broadcast size for candidate selectivity. Cell width should be on
    * the order of the radius: ~2-5 cells per probe per axis.
    */
  def rangeJoinCells(targets: DataFrame, probes: DataFrame,
                     radiusUdeg: Long, level: Int): DataFrame = {
    require(radiusUdeg >= 0, s"rangeJoinCells: negative radius $radiusUdeg")
    require(level >= 0 && level <= GridCell.MaxLevel,
      s"rangeJoinCells: level out of range: $level")
    val spark = targets.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)

    val probeArr = probes.select("id", "x", "y")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val n = 1L << level
    // Cells covering each probe's radius box. lonToX/latToY are monotone
    // in their double argument and x/1e6 rounds monotonically, so the
    // unpadded range already contains every in-radius target's cell; the
    // one-cell pad is belt-and-braces against future metric changes.
    val cover = probeArr.toSeq.flatMap { case (pid, px, py) =>
      val x0 = math.max(GridCell.lonToX((px - radiusUdeg) / 1e6, level) - 1, 0L)
      val x1 = math.min(GridCell.lonToX((px + radiusUdeg) / 1e6, level) + 1, n - 1)
      val y0 = math.max(GridCell.latToY((py - radiusUdeg) / 1e6, level) - 1, 0L)
      val y1 = math.min(GridCell.latToY((py + radiusUdeg) / 1e6, level) + 1, n - 1)
      for (cx <- x0 to x1; cy <- y0 to y1)
        yield (pid, GridCell.pack(cx, cy, level), px, py)
    }.toDF("probe_id", "cell", "px", "py")

    val withCell = targets.select(
      col("id").as("target_id"), col("x"), col("y"),
      GraftFunctions.gridCell(col("x") / lit(1000000.0),
        col("y") / lit(1000000.0), lit(level)).as("cell"))
    val dx = col("x") - col("px")
    val dy = col("y") - col("py")
    withCell
      .join(broadcast(cover), Seq("cell"))
      .select(col("probe_id"), col("target_id"),
        (dx * dx + dy * dy).as("dist2"))
      .filter(col("dist2") <= lit(radiusUdeg * radiusUdeg))
  }
}
