package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Interval-overlap self join (Events.copresencePairs), 2-D Pareto
  * skyline (Relational.skyline) and the Q13 outer-join distribution —
  * brute-force differentials plus the invariances that certify the
  * scale machinery (bucket size must not change the answer).
  */
class IntervalSkylineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tsAt(min: Long) = new Timestamp(min * 60000L)

  private def eventsDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.map { case (id, user, min) => (id, user, tsAt(min)) }
      .toDF("event_id", "user_id", "ts")
  }

  test("copresence: bucket-boundary pair, endpoint touch, same-user exclusion") {
    // user 1: one session spanning minutes 0..100 (gaps <= 30) — crosses
    // the 60-min bucket boundary when bucketUs = 1h
    // user 2: session 60..61 — overlap start 60 lands in bucket 1, which
    //   is NOT user 1's first covered bucket (dedup predicate is live)
    // user 3: single event at minute 100 — touches user 1's endpoint
    //   exactly (ov_us = 0 must be emitted)
    // user 4: minute 200 — no overlap with anyone
    val ev = eventsDf(Seq(
      (1L, 1L, 0L), (2L, 1L, 25L), (3L, 1L, 50L), (4L, 1L, 75L), (5L, 1L, 100L),
      (6L, 2L, 60L), (7L, 2L, 61L),
      (8L, 3L, 100L),
      (9L, 4L, 200L)))
    val out = Events.copresencePairs(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val m = 60000000L // one minute in micros
    assert(out === Set(
      (1L, 2L, 1L, 1L, 60 * m, 1 * m),
      (1L, 3L, 1L, 1L, 100 * m, 0L)))
  }

  test("copresence: brute-force parity and bucket-size invariance") {
    // deterministic pseudo-random event soup: 12 users, 120 events
    val rows = (0 until 120).map { i =>
      val id = i.toLong
      val user = (i * 7 % 12).toLong
      val min = (i * 131 + (i * i % 37) * 11) % 600
      (id, user, min.toLong)
    }
    val ev = eventsDf(rows)
    val iv = Events.sessionIntervals(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = (for {
      (ua, sa, t0a, t1a) <- iv
      (ub, sb, t0b, t1b) <- iv
      if ua < ub && t0a <= t1b && t0b <= t1a
    } yield (ua, ub, sa, sb, math.max(t0a, t0b),
        math.min(t1a, t1b) - math.max(t0a, t0b))).toSet
    assert(brute.nonEmpty, "fixture produced no overlapping pair")
    for (bucketUs <- Seq(600L * 1000000L, 3600L * 1000000L, 86400L * 1000000L)) {
      val out = Events.copresencePairs(ev, bucketUs = bucketUs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(out.length === out.toSet.size, s"duplicate pair at bucket $bucketUs")
      assert(out.toSet === brute, s"mismatch at bucket $bucketUs")
    }
  }

  test("skyline: brute-force dominance parity, duplicates both survive") {
    import spark.implicits._
    val pts = (0 until 200).map { i =>
      val price = 900.0 + (i * 37 % 100) + (i % 3) * 0.25
      val size = 1 + (i * 53 % 50)
      (i.toLong, price, size)
    } ++ Seq( // exact duplicate pair on the frontier: both must survive
      (900L, 890.0, 60), (901L, 890.0, 60))
    val parts = pts.toDF("p_partkey", "p_retailprice", "p_size")
    def priceQ(p: Double) = math.round(p * 10000.0)
    val brute = pts.filter { case (_, pa, sa) =>
      !pts.exists { case (_, pb, sb) =>
        priceQ(pb) <= priceQ(pa) && sb >= sa &&
          (priceQ(pb) < priceQ(pa) || sb > sa)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    assert(brute.exists(_._1 == 900L) && brute.exists(_._1 == 901L))
    for (bucket <- Seq(1L, 1000L, 100000L, 100000000L)) {
      val got = Relational.skyline(parts, bucket = bucket)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      assert(got === brute, s"mismatch at bucket $bucket")
    }
  }

  test("orderCountDistribution keeps zero-order customers") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "5-LOW"), (11L, 1L, "5-LOW"),
      (12L, 2L, "1-URGENT")) // excluded -> customer 2 counts as zero
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Relational.orderCountDistribution(customer, orders)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(2L -> 1L, 0L -> 2L))
  }
}
