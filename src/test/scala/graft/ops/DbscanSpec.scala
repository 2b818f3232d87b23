package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN vs a brute-force reference implementation, plus the pinned
  * border tie contract and parallelism determinism.
  */
class DbscanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (id, x, y) in micro-degrees
  private val eps = 1000000L // 1 degree
  private val minPts = 3

  /** Brute-force reference: textbook DBSCAN with the lowest-label border
    * contract. Returns (id -> (cluster, role)).
    */
  private def reference(pts: Seq[(Long, Long, Long)]): Map[Long, (Long, String)] = {
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map(p => p._1 ->
      pts.filter(q => d2(p, q) <= eps * eps).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    // components over core-core edges via repeated min-label
    var label = core.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      for (u <- core; v <- nbrs(u) if core(v)) {
        val m = math.min(label(u), label(v))
        if (label(u) != m || label(v) != m) {
          label += u -> m; label += v -> m; changed = true
        }
      }
    }
    val borders = pts.map(_._1).filterNot(core)
      .flatMap { id =>
        val cs = nbrs(id).filter(core)
        if (cs.isEmpty) None else Some(id -> (cs.map(label).min, "border"))
      }.toMap
    core.map(id => id -> (label(id), "core")).toMap ++ borders
  }

  private def run(pts: Seq[(Long, Long, Long)], parts: Int = 4): Map[Long, (Long, String)] = {
    import spark.implicits._
    val df = pts.toDF("id", "x", "y").repartition(parts)
    Dbscan.dbscan(df, eps, minPts, level = 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
  }

  test("two blobs, a border bridge, and noise match the reference") {
    // blob A around (10, 10) deg, blob B around (50, 50) deg, a border
    // point 0.9 deg from one A member (not dense itself), pure noise far
    // away. udeg coords.
    val A = Seq((1L, 10000000L, 10000000L), (2L, 10400000L, 10000000L),
      (3L, 10000000L, 10500000L), (4L, 10300000L, 10300000L))
    val B = Seq((10L, 50000000L, 50000000L), (11L, 50500000L, 50000000L),
      (12L, 50000000L, 50600000L))
    val border = Seq((20L, 11300000L, 10000000L)) // within 1 deg of id 2 only
    val noise = Seq((30L, -120000000L, -60000000L))
    val pts = A ++ B ++ border ++ noise
    val got = run(pts)
    val want = reference(pts)
    assert(got === want)
    assert(got(1L)._2 === "core" && got(1L)._1 === 1L)
    assert(got(20L) === ((1L, "border")))
    assert(!got.contains(30L))
    // blob B: 3 points all within 1 deg of each other? 10-11 dist 0.5,
    // 10-12 0.6, 11-12 sqrt(0.25+0.36)=0.78 — all cores, one cluster
    assert(got(11L) === ((10L, "core")))
  }

  test("exactly-minPts boundary and parallelism determinism") {
    // a point with exactly minPts-1 neighbors + itself = minPts → core
    val pts = Seq((1L, 0L, 0L), (2L, 500000L, 0L), (3L, 0L, 500000L),
      (4L, 80000000L, 0L))
    val got = run(pts)
    assert(got(1L)._2 === "core")
    for (p <- Seq(1, 2, 7)) assert(run(pts, p) === got, s"parts=$p")
  }

  test("singleton core cluster: dense point whose neighbors are all border") {
    // center with 2 neighbors (core at minPts=3); neighbors have only 2
    // ε-neighbors themselves (center + nothing) → border, both to the
    // center's singleton-core cluster
    val pts = Seq((5L, 0L, 0L), (6L, 900000L, 0L), (7L, -900000L, 0L))
    val got = run(pts)
    val want = reference(pts)
    assert(got === want)
    assert(got(5L) === ((5L, "core")))
    assert(got(6L) === ((5L, "border")) && got(7L) === ((5L, "border")))
  }
}
