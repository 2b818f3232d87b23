package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ordered funnel: time-order enforcement (out-of-order steps do NOT
  * count), first-touch reach times, conversion ppm arithmetic, and
  * empty-step behavior.
  */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("funnel-spec").getOrCreate()

  private def run(rows: Seq[(Long, String, Long)], steps: Seq[String])
      : Seq[(Int, String, Long, Long)] = {
    import spark.implicits._
    Events.funnel(
        rows.map { case (u, t, sec) => (u, t, new Timestamp(sec * 1000L)) }
          .toDF("user_id", "event_type", "ts"),
        steps)
      .orderBy("step_no")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("order matters: a click before the first view does not convert") {
    val rows = Seq(
      (1L, "view", 10L), (1L, "click", 20L),   // converts
      (2L, "click", 10L), (2L, "view", 20L),   // click too early
      (3L, "view", 10L))                        // never clicks
    val got = run(rows, Seq("view", "click"))
    assert(got === Seq((1, "view", 3L, 1000000L), (2, "click", 1L, 333333L)))
  }

  test("first-touch semantics: a later re-view cannot resurrect an early click") {
    // user clicks at 15 between views at 10 and 20: the reach time of
    // view is 10 (first touch), so the click at 15 counts
    val rows = Seq((1L, "view", 10L), (1L, "click", 15L), (1L, "view", 20L))
    val got = run(rows, Seq("view", "click"))
    assert(got(1) === ((2, "click", 1L, 1000000L)))
  }

  test("three steps chain reach times transitively") {
    val rows = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full
      (2L, "view", 1L), (2L, "purchase", 2L),                    // skips click
      (3L, "view", 1L), (3L, "click", 2L),                       // no purchase
      (4L, "purchase", 1L), (4L, "view", 2L), (4L, "click", 3L), // buy first
      (5L, "view", 1L), (5L, "click", 2L), (5L, "purchase", 1L)) // buy too early
    val got = run(rows, Seq("view", "click", "purchase"))
    assert(got === Seq(
      (1, "view", 5L, 1000000L),
      (2, "click", 4L, 800000L),
      (3, "purchase", 1L, 250000L)))
  }

  test("an empty step zeroes the tail without dividing by zero") {
    val rows = Seq((1L, "view", 1L), (2L, "view", 2L))
    val got = run(rows, Seq("view", "signup", "purchase"))
    assert(got === Seq(
      (1, "view", 2L, 1000000L),
      (2, "signup", 0L, 0L),
      (3, "purchase", 0L, 0L)))
  }
}
