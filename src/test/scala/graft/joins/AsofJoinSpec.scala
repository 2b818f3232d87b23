package graft.joins

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join via UNION + one window (AsofJoin.scala). */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("at-or-before semantics, inclusive match, unmatched -> null") {
    import spark.implicits._
    val probe = Seq((100L, 1L, ts(0)), (101L, 1L, ts(1)), (102L, 1L, ts(3)),
        (103L, 1L, ts(5)), (104L, 1L, ts(7)), (105L, 1L, ts(12)),
        (106L, 2L, ts(4)))
      .toDF("pid", "key", "ts")
    val build = Seq((1L, ts(1), "a"), (1L, ts(5), "b"), (1L, ts(10), "c"))
      .toDF("key", "ts", "v")
    val out = AsofJoin.asofJoin(probe, build, Seq("key"), "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out === Map(100L -> None, 101L -> Some("a"), 102L -> Some("a"),
      103L -> Some("b"), 104L -> Some("b"), 105L -> Some("c"), 106L -> None))
  }

  test("multi-column payload is atomic even when a payload field is null") {
    import spark.implicits._
    // the ts(5) build row carries (id=2, v=null): a torn per-column carry
    // would pair id=2 with the EARLIER row's non-null v
    val probe = Seq((100L, 1L, ts(6))).toDF("pid", "key", "ts")
    val build = Seq((1L, ts(1), 1L, Option("x")), (1L, ts(5), 2L, None: Option[String]))
      .toDF("key", "ts", "bid", "v")
    val r = AsofJoin.asofJoin(probe, build, Seq("key"), "ts", Seq("bid", "v"))
      .collect().head
    assert(r.getLong(3) === 2L && r.isNullAt(4), r.toString)
  }

  test("differential vs brute-force scan on a random multi-key fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val probe = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(7) + 1).toLong, ts(rnd.nextInt(1000))))
    val build = (0 until 200).map(i =>
      ((rnd.nextInt(7) + 1).toLong, ts(rnd.nextInt(1000)), i.toLong))
      // contract: unique per (key, ts) — keep max id
      .groupBy(r => (r._1, r._2)).map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }
      .toSeq
    val expected = probe.map { case (pid, k, pts) =>
      val cand = build.filter(b => b._1 == k && !b._2.after(pts))
      pid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(b => (b._2.getTime, b._3))._3))
    }.toMap
    val got = AsofJoin.asofJoin(
        probe.toDF("pid", "key", "ts"), build.toDF("key", "ts", "bid"),
        Seq("key"), "ts", Seq("bid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got === expected)
    // parallelism determinism
    val again = AsofJoin.asofJoin(
        probe.toDF("pid", "key", "ts").repartition(11),
        build.toDF("key", "ts", "bid").repartition(3),
        Seq("key"), "ts", Seq("bid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(again === expected)
  }

  test("the physical plan has ONE exchange and ZERO joins") {
    import spark.implicits._
    val probe = Seq((1L, 1L, ts(0))).toDF("pid", "key", "ts")
    val build = Seq((1L, ts(1), "a")).toDF("key", "ts", "v")
    val p = AsofJoin.asofJoin(probe, build, Seq("key"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "as-of must compose without a join:\n" + p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "expected exactly one shuffle:\n" + p.take(1500))
  }

  test("null timestamps are rejected loudly") {
    import spark.implicits._
    val probe = Seq((1L, 1L, null.asInstanceOf[Timestamp])).toDF("pid", "key", "ts")
    val build = Seq((1L, ts(1), "a")).toDF("key", "ts", "v")
    val e = intercept[Exception] {
      AsofJoin.asofJoin(probe, build, Seq("key"), "ts", Seq("v")).collect()
    }
    assert(e.getMessage.contains("asofJoin: null ts") ||
      Option(e.getCause).exists(_.getMessage.contains("asofJoin: null ts")), e.getMessage)
  }
}
