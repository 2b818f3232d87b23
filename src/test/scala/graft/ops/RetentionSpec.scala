package graft.ops

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(day: Long, sec: Long = 0L): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(day * 86400L + sec))

  test("retention matrix on a handcrafted cohort fixture") {
    import spark.implicits._
    val ev = Seq(
      // user 1: days 0, 1, 3   user 2: day 0 twice, day 1   user 3: day 1
      (1L, ts(0), 1L, "visit"), (2L, ts(1), 1L, "visit"), (3L, ts(3), 1L, "visit"),
      (4L, ts(0), 2L, "visit"), (5L, ts(0, 3600), 2L, "visit"), (6L, ts(1), 2L, "visit"),
      (7L, ts(1), 3L, "visit")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.retention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (0L, 0L, 2L, 1000000L), (0L, 1L, 2L, 1000000L), (0L, 3L, 1L, 500000L),
      (1L, 0L, 1L, 1000000L)))
  }

  test("transition matrix with per-source ppm and event_id tie-break") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0, 1), 1L, "a"), (2L, ts(0, 2), 1L, "b"), (3L, ts(0, 3), 1L, "a"),
      (4L, ts(0, 1), 2L, "b"), (5L, ts(0, 2), 2L, "b"),
      // user 3: identical timestamps — order must fall back to event_id
      (10L, ts(0, 9), 3L, "x"), (11L, ts(0, 9), 3L, "y")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a", "b", 1L, 1000000L), ("b", "a", 1L, 500000L), ("b", "b", 1L, 500000L),
      ("x", "y", 1L, 1000000L)))
  }

  test("single-event users produce no transitions and full day-0 retention") {
    import spark.implicits._
    val ev = Seq((1L, ts(2), 7L, "solo")).toDF("event_id", "ts", "user_id", "event_type")
    assert(Events.transitions(ev).count() == 0)
    val ret = Events.retention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ret == Set((2L, 0L, 1L, 1000000L)))
  }
}
