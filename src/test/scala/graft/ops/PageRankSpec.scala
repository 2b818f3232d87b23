package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer fixed-point PageRank vs an independent single-threaded
  * reference on hand graphs (including a dangling node), plus mass
  * conservation bounds and parallelism determinism.
  */
class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pagerank-spec").getOrCreate()

  /** Reference implementation: plain Scala Long arithmetic, same op
    * order as the engine ((r*num)/(den*deg) per edge, floor divisions).
    */
  private def refRank(edges: Seq[(Long, Long)], iters: Int,
                      scale: Long = 1000000000000L,
                      num: Long = 17, den: Long = 20): Map[Long, Long] = {
    val e = edges.filter { case (s, d) => s != d }.distinct
    val nodes = e.flatMap { case (s, d) => Seq(s, d) }.distinct.sorted
    val n = nodes.size.toLong
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val base = (scale * (den - num)) / (den * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(deg.contains).map(r).sum
      val dShare = (dang * num) / (den * n)
      val contrib = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => (r(s) * num) / (den * deg(s)) }.sum
      }
      r = nodes.map(nd => nd -> (base + dShare + contrib.getOrElse(nd, 0L))).toMap
    }
    r
  }

  private def runSpark(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    WebOps.pageRank(edges.toDF("src", "dst"), iters = iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  test("matches the reference on a hand graph with a dangling node") {
    // 3 -> nothing (dangling); 0 <-> 1 hub pair; 2 feeds both
    val edges = Seq[(Long, Long)]((0, 1), (1, 0), (2, 0), (2, 1), (0, 3), (1, 3))
    for (iters <- Seq(1, 2, 5)) {
      assert(runSpark(edges, iters) === refRank(edges, iters),
        s"mismatch at iters=$iters")
    }
  }

  test("self-loops and duplicate edges are ignored") {
    val clean = Seq[(Long, Long)]((0, 1), (1, 2), (2, 0))
    val noisy = clean ++ Seq[(Long, Long)]((0, 0), (1, 1), (0, 1), (0, 1), (2, 0))
    assert(runSpark(noisy, 3) === refRank(clean, 3))
  }

  test("mass is conserved up to floor-division loss") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 40), (i, (i * 13 + 3) % 40)))
    val r = runSpark(edges, 5)
    val scale = 1000000000000L
    val total = r.values.sum
    // each of the 5 rounds floors away < 1 unit per edge + 2 per node
    val maxLoss = 5L * (edges.distinct.size + 2 * 40)
    assert(total <= scale && total >= scale - maxLoss,
      s"total mass $total outside [$scale - $maxLoss, $scale]")
  }

  test("deterministic across input partitioning") {
    import spark.implicits._
    val edges = (0L until 200L).flatMap(i =>
      Seq((i % 23, (i * 31 + 7) % 23), (i % 23, (i * 17 + 3) % 23)))
    def run(parts: Int): Map[Long, Long] =
      WebOps.pageRank(edges.toDF("src", "dst").repartition(parts), iters = 5)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val a = run(1)
    assert(run(13) === a)
    assert(a === refRank(edges, 5))
  }

  test("rejects bad parameters and empty graphs") {
    import spark.implicits._
    val e = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException](WebOps.pageRank(e, iters = 0))
    intercept[IllegalArgumentException](
      WebOps.pageRank(e, dampNum = 21, dampDen = 20))
    intercept[IllegalArgumentException](
      WebOps.pageRank(Seq((5L, 5L)).toDF("src", "dst"), iters = 1))
  }
}
