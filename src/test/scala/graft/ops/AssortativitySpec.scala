package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AssortativitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** BigInt reference over the deduped self-loop-free edge set. */
  private def ref(edges: Seq[(Long, Long)]): (Long, BigInt, BigInt, BigInt, Long) = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val outd = e.groupBy(_._1).map { case (s, g) => s -> BigInt(g.size) }
    val ind = e.groupBy(_._2).map { case (d, g) => d -> BigInt(g.size) }
    val jk = e.map { case (s, d) => (outd(s), ind(d)) }
    val m = BigInt(jk.size)
    val sj = jk.map(_._1).sum; val sk = jk.map(_._2).sum
    val sjk = jk.map(p => p._1 * p._2).sum
    val sj2 = jk.map(p => p._1 * p._1).sum; val sk2 = jk.map(p => p._2 * p._2).sum
    val num = m * sjk - sj * sk
    val denj = m * sj2 - sj * sj; val denk = m * sk2 - sk * sk
    val ppm = if (denj <= 0 || denk <= 0) 0L
      else (num.signum * (num * num * 1000000 / (denj * denk))).toLong
    (m.toLong, num, denj, denk, ppm)
  }

  private def run(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = WebOps.degreeAssortativity(edges.toDF("src", "dst")).collect()(0)
    (r.getLong(0), BigInt(r.getLong(6)), BigInt(r.getLong(7)),
      BigInt(r.getLong(8)), r.getLong(9))
  }

  test("bidirectional star is perfectly disassortative (r = -1)") {
    // hub <-> each leaf: every edge pairs degree 10 with degree 1 in one
    // of the two orders — the textbook r = -1 case, so r2_ppm = -10^6
    val edges = (1L to 10L).flatMap(l => Seq((0L, l), (l, 0L)))
    val got = run(edges)
    assert(got == ref(edges))
    assert(got._5 == -1000000L, s"bidirectional star should hit r=-1: $got")
  }

  test("1-regular ring has zero degree variance (ppm exactly 0)") {
    val edges = (0L until 8L).map(i => (i, (i + 1) % 8))
    val got = run(edges)
    assert(got == ref(edges))
    assert(got._3 == 0 && got._4 == 0 && got._5 == 0L)
  }

  test("random multigraphs with self-loops match the BigInt reference") {
    val rnd = new scala.util.Random(5)
    (1 to 5).foreach { _ =>
      val edges = (0 until 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      assert(run(edges) == ref(edges))
    }
  }
}
