package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Weighted systematic sampling: exact-k totals, multi-copy heavy items,
  * proportionality bounds, bucket-boundary equivalence (bucketed prefix
  * sum ≡ the single-window reference), and zero-weight exclusion.
  */
class SystematicSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("systematic-spec").getOrCreate()

  private def run(ws: Seq[(Long, Long)], k: Long, bucket: Long = 1L << 20)
      : Map[Long, (Long, Long)] = {
    import spark.implicits._
    Selection.systematicSample(ws.toDF("doc_id", "w"), k, "w", bucket)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  /** Single-pass reference. */
  private def brute(ws: Seq[(Long, Long)], k: Long): Map[Long, (Long, Long)] = {
    val pos = ws.filter(_._2 > 0).sortBy(_._1)
    val tw = pos.map(_._2).sum
    var cum = 0L
    pos.flatMap { case (id, w) =>
      val n = (cum + w) * k / tw - cum * k / tw
      cum += w
      if (n >= 1) Some(id -> ((w, n))) else None
    }.toMap
  }

  test("copies sum to exactly k across weight shapes") {
    for (k <- Seq(1L, 7L, 50L, 100L)) {
      val ws = (0L until 200L).map(i => (i, (i * i) % 13 + 1))
      val got = run(ws, k)
      assert(got.values.map(_._2).sum === k, s"k=$k")
      assert(got === brute(ws, k))
    }
  }

  test("a heavy item earns multiple copies") {
    // one item holds half the mass -> ~k/2 copies
    val ws = (0L until 20L).map(i => (i, 1L)) :+ (99L, 20L)
    val got = run(ws, 10)
    assert(got(99L)._2 === 5L)
    assert(got.values.map(_._2).sum === 10L)
    assert(got === brute(ws, 10))
  }

  test("bucketed prefix sum equals the single-window reference") {
    val ws = (0L until 300L).map(i => (i, (i * 7) % 23 + 1))
    for (bucket <- Seq(1L, 16L, 64L, 1024L)) {
      assert(run(ws, 37, bucket) === brute(ws, 37), s"bucket=$bucket")
    }
  }

  test("zero-weight items are excluded and never sampled") {
    val ws = Seq((0L, 5L), (1L, 0L), (2L, 5L), (3L, 0L), (4L, 10L))
    val got = run(ws, 4)
    assert(!got.contains(1L) && !got.contains(3L))
    assert(got.values.map(_._2).sum === 4L)
    assert(got === brute(ws, 4))
  }

  test("k greater than total weight still telescopes to k copies") {
    val ws = Seq((0L, 1L), (1L, 2L), (2L, 1L))
    val got = run(ws, 10)
    assert(got.values.map(_._2).sum === 10L)
    assert(got === brute(ws, 10))
  }
}
