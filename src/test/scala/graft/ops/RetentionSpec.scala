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

  test("trailing-window anomaly: spike ppm, empty window, and gap handling") {
    import spark.implicits._
    def ev(id: Long, hour: Long, typ: String) = (id, ts(0, hour * 3600), 1L, typ)
    // type "a": 2,2,2 in hours 0-2, then a spike of 12 in hour 3;
    // a gap (hour 4 empty) then 1 in hour 5 — the RANGE frame must span
    // calendar hours, so hour 5's window still sees hours 1-3 (wait: 24h
    // window sees all of 0-4 -> sum 18)
    val rows = (
      (1L to 2L).map(i => ev(i, 0, "a")) ++ (3L to 4L).map(i => ev(i, 1, "a")) ++
      (5L to 6L).map(i => ev(i, 2, "a")) ++ (7L to 18L).map(i => ev(i, 3, "a")) ++
      Seq(ev(19L, 5, "a")) ++ Seq(ev(20L, 0, "b"))
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.hourlyAnomaly(rows, windowHours = 24).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
         if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // hour 0: empty trailing window -> null ppm
    assert(got(("a", 0L)) == (2L, 0L, 0L, None))
    assert(got(("b", 0L)) == (1L, 0L, 0L, None))
    // hour 3: n=12 vs prev_sum=6 over 3 occupied hours -> 12*24e6/6 = 48e6
    assert(got(("a", 3L)) == (12L, 6L, 3L, Some(48000000L)))
    // hour 5 skips the empty hour 4: prev_sum = 2+2+2+12 = 18
    assert(got(("a", 5L)) == (1L, 18L, 4L, Some(1333333L)))
  }

  test("single-event users produce no transitions and full day-0 retention") {
    import spark.implicits._
    val ev = Seq((1L, ts(2), 7L, "solo")).toDF("event_id", "ts", "user_id", "event_type")
    assert(Events.transitions(ev).count() == 0)
    val ret = Events.retention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ret == Set((2L, 0L, 1L, 1000000L)))
  }

  test("session paths: ordering, truncation, and counting") {
    import spark.implicits._
    // user 1: one session a>b>c; user 2: two sessions (a>b, a>b) split by
    // a 2-hour gap; user 3: 7-step session truncated to 5
    val rows = Seq(
      (1L, ts(0, 0), 1L, "a"), (2L, ts(0, 60), 1L, "b"), (3L, ts(0, 120), 1L, "c"),
      (4L, ts(0, 0), 2L, "a"), (5L, ts(0, 30), 2L, "b"),
      (6L, ts(0, 8000), 2L, "a"), (7L, ts(0, 8030), 2L, "b")) ++
      (0 until 7).map(k => (10L + k, ts(0, 10 * k), 3L, ('p' + k).toChar.toString))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.sessionPaths(ev, maxSteps = 5, topK = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a>b") === 2L)
    assert(got("a>b>c") === 1L)
    assert(got("p>q>r>s>t") === 1L) // truncated at 5 steps
    assert(got.size === 3)
    // determinism across partitioning
    val re = Events.sessionPaths(ev.repartition(7), maxSteps = 5, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(re === got)
  }

  test("active users: exact DAU/WAU incl. a zero-DAU trailing day") {
    import spark.implicits._
    // user 1 on days 0 and 2; user 2 on day 0. Day 1: DAU 0, WAU 2.
    val ev = Seq(
      (1L, ts(0), 1L, "x"), (2L, ts(0, 5), 1L, "x"), (3L, ts(2), 1L, "x"),
      (4L, ts(0), 2L, "x")).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.activeUsers(ev, windowDays = 7).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) === ((2L, 2L)))
    assert(got(1L) === ((0L, 2L))) // no events that day, both in window
    assert(got(2L) === ((1L, 2L)))
    assert(!got.contains(3L) || got.keySet.max == 2L) // cut at max day
    assert(got.keySet.max === 2L)
  }

  test("crosstab: hand counts, nodata skip, mass conservation") {
    import graft.tiles.{RasterSpec, Tile, TileOps, TileOps2}
    val spec = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 4, 1)
    val classes = TileOps.createRaster(spark, spec)((x, _, _) => (x / 4).toDouble)
    val values = TileOps.createRaster(spark, spec)(
      (x, y, _) => if (x == 0 && y == 0) -9999.0 else ((x + y) % 2).toDouble)
    val got = TileOps2.crosstab(classes, values).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    // class 0 = left half (32 px, one nodata): parity split 16/16 minus
    // the (0,0) nodata which has parity 0 → (0,0.0)=15, (0,1.0)=16
    assert(got((0.0, 0.0)) === 15L && got((0.0, 1.0)) === 16L)
    assert(got((1.0, 0.0)) === 16L && got((1.0, 1.0)) === 16L)
    assert(got.values.sum === 63L)
  }
}
