package graft.joins

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact k-nearest-neighbor join.
  *
  * Semantics follow the reference's nearest-target search — candidates
  * scanned in ascending distance order with an early exit
  * (reference: buteo/array/distance.py:70-132) — re-expressed for Spark:
  *
  *  - `knnBroadcastProbes`: the probe set is broadcast; every target
  *    partition computes a local top-k per probe (map-side combine), and a
  *    tiny shuffle (numPartitions × P × k rows) merges them with a window.
  *    Exact for any metric; the big (target) side is never shuffled, so
  *    this scales to 10^12 targets as a map-only pass + micro-shuffle.
  *  - the cell-pruned variant for large probe sets lives with the hex
  *    index (k-ring expansion); see SURVEY.md §2.3.
  *
  * The metric here is squared euclidean distance on integer microdegree
  * coordinates — exact 64-bit arithmetic, so results are reproducible
  * bit-for-bit against any engine.
  */
object KnnJoin {

  /** points: (id long, x long, y long). Returns (query_id, neighbor_id,
    * dist2, rank) for the k nearest targets of each probe (self excluded,
    * ties broken by ascending neighbor id).
    */
  def knnBroadcastProbes(targets: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val spark = targets.sparkSession
    import spark.implicits._
    val probeArr = probes.select("id", "x", "y").as[(Long, Long, Long)].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(probeArr)

    val partial = targets.select("id", "x", "y").as[(Long, Long, Long)]
      .mapPartitions { it =>
        val ps = bc.value
        // per-probe bounded max-heaps of (dist2, neighborId)
        val ord = Ordering.Tuple2[Long, Long] // max at head via reverse below
        val heaps = Array.fill(ps.length)(
          scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord))
        it.foreach { case (tid, tx, ty) =>
          var i = 0
          while (i < ps.length) {
            val (pid, px, py) = ps(i)
            if (pid != tid) {
              val dx = px - tx; val dy = py - ty
              val d2 = dx * dx + dy * dy
              val h = heaps(i)
              if (h.size < k) h.enqueue((d2, tid))
              else if (ord.lt((d2, tid), h.head)) { h.dequeue(); h.enqueue((d2, tid)) }
            }
            i += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          h.iterator.map { case (d2, tid) => (ps(i)._1, tid, d2) }
        }
      }.toDF("query_id", "neighbor_id", "dist2")

    val w = Window.partitionBy("query_id").orderBy(col("dist2"), col("neighbor_id"))
    partial
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Cell-pruned kNN for LARGE probe sets (both sides big): probes explode
    * their grid-cell k-ring, targets carry their cell, an equi-join on the
    * cell id produces candidates, a window takes the top-k.
    *
    * This is the distributed form of the reference's sorted-ring candidate
    * scan (buteo/array/distance.py:109-128): ring radius `rings` bounds
    * the search; `guaranteed` marks probes whose k-th distance is provably
    * exact (kth dist < (rings) * cellSize — no unexplored cell can hold a
    * closer point). The shuffle key is the cell id; skewed cells are
    * AQE-splittable.
    */
  def knnCellPruned(points: DataFrame, level: Int, rings: Int, k: Int): DataFrame = {
    import graft.expr.GraftFunctions
    val spark = points.sparkSession
    GraftFunctions.register(spark)
    // integer microdegree coords → lon/lat → cell (exact formula shared
    // with GridCell); cell sizes in udeg at `level`
    val cellWUdeg = 360000000.0 / (1L << level)
    val cellHUdeg = 180000000.0 / (1L << level) // GridCell lat span is 180°
    val minCell = math.min(cellWUdeg, cellHUdeg)
    val withCell = points
      .withColumn("lon", col("x") / lit(1000000.0))
      .withColumn("lat", col("y") / lit(1000000.0))
      .withColumn("cell", GraftFunctions.gridCell(col("lon"), col("lat"), lit(level)))
    val targets = withCell.select(col("id").as("t_id"), col("x").as("tx"),
      col("y").as("ty"), col("cell"))
    val probes = withCell
      .select(col("id").as("query_id"), col("x").as("px"), col("y").as("py"),
        explode(GraftFunctions.gridKRing(col("cell"), lit(rings))).as("cell"))
    val cand = probes.join(targets, Seq("cell"))
      .filter(col("t_id") =!= col("query_id"))
      .select(col("query_id"), col("t_id").as("neighbor_id"),
        ((col("px") - col("tx")) * (col("px") - col("tx")) +
          (col("py") - col("ty")) * (col("py") - col("ty"))).as("dist2"))
      .groupBy("query_id", "neighbor_id").agg(min("dist2").as("dist2"))
    val w = Window.partitionBy("query_id").orderBy(col("dist2"), col("neighbor_id"))
    val bound = (rings.toDouble * minCell) * (rings.toDouble * minCell)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("guaranteed", col("dist2") < lit(bound))
  }
}
