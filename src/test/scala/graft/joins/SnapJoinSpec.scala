package graft.joins

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snap join: hand-computed certificates for all three clamp cases,
  * the zero-distance on-line case, the tie-break, exact unreduced
  * rationals, and the loud Long-envelope overflow guard.
  */
class SnapJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("SnapJoinSpec").getOrCreate()

  private def segs = {
    import spark.implicits._
    Seq(
      (0L, 0L, 0L, 100L, 0L),     // x-axis segment
      (1L, 0L, 30L, 100L, 30L),   // parallel at y=30
      (2L, 200L, 200L, 210L, 210L) // far diagonal stub
    ).toDF("seg_id", "ax", "ay", "bx", "by")
  }

  private def snap(pts: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    SnapJoin.snapToSegments(pts.toDF("doc_id", "x", "y"), segs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
  }

  test("interior, endpoint, and on-line cases carry exact certificates") {
    val got = snap(Seq(
      (1L, 50L, 7L),    // interior above seg0: d² = 49/1... projection interior
      (2L, -5L, 3L),    // before seg0's start: clamps to a, d² = 25+9
      (3L, 108L, -6L),  // past seg0's end: clamps to b, d² = 64+36
      (4L, 70L, 0L)))   // exactly on seg0
    // interior: w=(50,7), d=(100,0), r=10000, dot=5000 -> num = (2500+49)*10000 - 25000000 = 490000, den = 10000 (d²=49)
    assert(got(1L) == ((0L, "mid", 490000L, 10000L)))
    assert(got(2L) == ((0L, "a", 34L, 1L)))
    assert(got(3L) == ((0L, "b", 100L, 1L)))
    assert(got(4L)._2 == "mid" && got(4L)._3 == 0L)
  }

  test("exact tie between two segments resolves to the lower seg_id") {
    // y=15 is exactly midway between seg0 (y=0) and seg1 (y=30)
    val got = snap(Seq((9L, 50L, 15L)))
    assert(got(9L) == ((0L, "mid", 2250000L, 10000L))) // d² = 225 exactly
  }

  test("every point gets exactly one winner") {
    val pts = (0 until 50).map(i => (i.toLong, (i * 7 % 120).toLong, (i * 13 % 60 - 10).toLong))
    import spark.implicits._
    val out = SnapJoin.snapToSegments(pts.toDF("doc_id", "x", "y"), segs)
    assert(out.count() == 50)
    assert(out.select("doc_id").distinct().count() == 50)
  }

  test("coordinates beyond the exact-Long envelope fail loudly") {
    import spark.implicits._
    // r = 9e18 and w2 ~ 1e12 each fit a Long, but the interior product
    // w2*r would not — the Decimal pre-check must raise
    val farSegs = Seq((0L, 0L, 0L, 3000000000L, 0L))
      .toDF("seg_id", "ax", "ay", "bx", "by")
    val pt = Seq((1L, 1000000L, 500L)).toDF("doc_id", "x", "y")
    val e = intercept[Exception] {
      SnapJoin.snapToSegments(pt, farSegs).collect()
    }
    assert(e.getMessage != null)
  }
}
