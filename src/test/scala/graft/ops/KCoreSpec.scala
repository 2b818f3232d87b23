package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling pinned on closed-form graphs (clique + tail, cycles,
  * cascading path peel, empty core) plus a simultaneous-peeling reference
  * differential on a deterministic pseudo-random graph.
  */
class KCoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("kcore-spec").getOrCreate()

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    WebOps.kCore(edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Simultaneous-peeling reference. */
  private def brute(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, o) => n -> o.size.toLong }
      val bad = deg.filter(_._2 < k).keySet
      changed = bad.nonEmpty
      e = e.filter(p => !bad(p._1) && !bad(p._2))
    }
    e.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, o) => n -> o.size.toLong }
  }

  test("K4 with a pendant tail: the 3-core is exactly the K4") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L))
    assert(run(edges, 3) === (1L to 4L).map(_ -> 3L).toMap)
  }

  test("cycle survives k=2 intact, dies entirely at k=3") {
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    assert(run(cycle, 2) === (0L until 6L).map(_ -> 2L).toMap)
    assert(run(cycle, 3) === Map.empty)
  }

  test("path peels end-inward over multiple cascading rounds to empty") {
    val path = (0L until 8L).map(i => (i, i + 1))
    assert(run(path, 2) === Map.empty)
  }

  test("cascade stops where the core begins: lollipop") {
    // K4 core with a 4-node path attached: k=2 keeps K4 only after the
    // path cascades away round by round
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val edges = k4 ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val got = run(edges, 3)
    assert(got === (1L to 4L).map(_ -> 3L).toMap)
  }

  test("brute-force differential on a deterministic pseudo-random graph") {
    val edges = (0 until 160).map { i =>
      val a = (i.toLong * i * 31 + i * 7 + 3) % 40L
      val b = (i.toLong * i * 17 + i * 5 + 11) % 40L
      (a, b)
    }.filter(e => e._1 != e._2)
    for (k <- Seq(2, 3, 4)) {
      assert(run(edges, k) === brute(edges, k), s"k=$k")
    }
  }

  test("maxRounds failure is loud") {
    val path = (0L until 20L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      run2(path, 2, maxRounds = 2)
    }
    assert(ex.getMessage.contains("converge"))
  }

  private def run2(edges: Seq[(Long, Long)], k: Int, maxRounds: Int): Unit = {
    import spark.implicits._
    WebOps.kCore(edges.toDF("src", "dst"), k, maxRounds).collect()
  }
}
