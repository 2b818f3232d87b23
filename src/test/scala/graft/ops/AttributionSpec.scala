package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Attribution windows (exact lookback boundary, same-microsecond tie,
  * unattributed conversions) and exact TV drift (zero, maximal, and a
  * hand-computed middle case).
  */
class AttributionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("AttributionSpec").getOrCreate()

  private val day = 24L * 3600 * 1000000

  private def ev(rows: Seq[(Long, Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.map { case (id, user, tpe, us, v) =>
      (id, new Timestamp(us / 1000), user, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("lookback boundary, last-touch recency, and unattributed conversions") {
    val base = 1700000000000000L // whole seconds -> survives Timestamp millis
    val rows = Seq(
      // user 1: click exactly 7 days before -> INSIDE the first-touch
      // window (RANGE lower bound is inclusive); later click wins last
      (1L, 1L, "click", base - 7 * day, 0.0),
      (2L, 1L, "click", base - day, 0.0),
      (3L, 1L, "purchase", base, 10.0),
      // user 2: only touch is OUTSIDE the lookback -> first null, last set
      (4L, 2L, "click", base - 8 * day, 0.0),
      (5L, 2L, "purchase", base, 20.0),
      // user 3: no clicks at all -> unattributed
      (6L, 3L, "purchase", base, 30.0),
      // user 4: click at the SAME instant as the purchase -> counts
      (7L, 4L, "click", base, 0.0),
      (8L, 4L, "purchase", base, 40.0))
    val got = Events.attribution(ev(rows))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6)))).toMap
    assert(got(3L) == ((Some(base - day), Some(base - 7 * day), true)))
    assert(got(5L) == ((Some(base - 8 * day), None, true)))
    assert(got(6L) == ((None, None, false)))
    assert(got(8L) == ((Some(base), Some(base), true)))
  }

  test("drift: identical cohorts give 0 ppm, disjoint give 1e6 ppm") {
    import spark.implicits._
    val same = ((0 until 100).map(i => (i.toLong, 10L)) ++
      (0 until 100).map(i => (100L + i, 10L)))
      .toDF("doc_id", "n_chars").withColumn("cohort", col("doc_id") >= 100)
    assert(Quality.drift(same.withColumn("cohort", col("cohort").cast("long")),
      "n_chars", "cohort", 16).head().getLong(4) == 0L)
    val disjoint = ((0 until 100).map(i => (i.toLong, 10L, 0L)) ++
      (0 until 50).map(i => (100L + i, 200L, 1L)))
      .toDF("doc_id", "n_chars", "cohort")
    assert(Quality.drift(disjoint, "n_chars", "cohort", 16)
      .head().getLong(4) == 1000000L)
  }

  test("drift: hand-computed asymmetric case") {
    import spark.implicits._
    // cohort a: 3 docs in bucket 0, 1 in bucket 16; cohort b: 1 and 3.
    // TV = (|3*4-1*4| + |1*4-3*4|) * 1e6 / (2*4*4) = 16e6/32 = 500000
    val df = Seq((0L, 1L, 0L), (1L, 2L, 0L), (2L, 3L, 0L), (3L, 17L, 0L),
      (4L, 5L, 1L), (5L, 18L, 1L), (6L, 19L, 1L), (7L, 20L, 1L))
      .toDF("doc_id", "n_chars", "cohort")
    val rows = Quality.drift(df, "n_chars", "cohort", 16).collect()
    assert(rows.forall(_.getLong(4) == 500000L))
    val byBucket = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byBucket(0L) == ((3L, 1L, 8L)))
    assert(byBucket(16L) == ((1L, 3L, 8L)))
  }
}
