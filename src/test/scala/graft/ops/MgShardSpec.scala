package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy hitters (candidate guarantee + exact verify at any
  * parallelism) and rendezvous sharding (minimal-movement invariant).
  */
class MgShardSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("MgShardSpec").getOrCreate()

  // skewed corpus: token i appears 2^(10-i) times for i in 0..9, plus a
  // 500-token noise tail appearing once each
  private def skewed = {
    import spark.implicits._
    val rows =
      (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"hot$i")) ++
        (0 until 500).map(i => s"tail$i")
    rows.toDF("tok")
  }

  test("heavyHitters equals the exact threshold set at every parallelism") {
    val df = skewed
    val n = df.count()
    val k = 20
    val expected = df.groupBy("tok").count()
      .where(col("count") * (k + 1) > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expected.nonEmpty && expected.size < 15, s"fixture sanity: $expected")
    for (parts <- Seq(1, 3, 8, 32)) {
      val got = Sketches.heavyHitters(df.repartition(parts), "tok", k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("MG candidate estimates undercount by at most N/(k+1)") {
    val df = skewed
    val n = df.count()
    val k = 20
    val truth = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cands = Sketches.mgCandidates(df.repartition(7), "tok", k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(cands.nonEmpty && cands.size <= k)
    for ((key, est) <- cands) {
      val f = truth(key)
      assert(est <= f, s"$key overcounted: est=$est true=$f")
      assert(est >= f - n / (k + 1) - 1, s"$key undercounted past bound")
    }
  }

  test("uniform data has no heavy hitters (empty candidate set path)") {
    import spark.implicits._
    val uniform = (0 until 1000).map(i => s"u${i % 100}").toDF("tok")
    assert(Sketches.heavyHitters(uniform, "tok", 5).count() == 0)
  }

  test("rendezvous: growing n to n+1 moves keys ONLY to the new shard") {
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"https://h$i.example/$i").toDF("k")
    for (family <- Seq("xxhash64", "md5prefix")) {
      val a = keys.select(
        Scalers.rendezvousShard(col("k"), 10, family).as("s10"),
        Scalers.rendezvousShard(col("k"), 11, family).as("s11"))
      val moved = a.where(col("s10") =!= col("s11"))
      val nMoved = moved.count()
      // every moved key lands on the new shard id 10
      assert(moved.where(col("s11") =!= 10).count() == 0, family)
      // expected movement = 1/11 of keys; allow a wide deterministic band
      assert(nMoved > 2000 / 22 && nMoved < 2000 * 3 / 11, s"$family moved $nMoved")
      // and the new shard receives exactly the moved keys
      assert(a.where(col("s11") === 10).count() == nMoved, family)
    }
  }

  test("rendezvous shard is total: every key gets a shard in [0, n)") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"k$i").toDF("k")
    val s = keys.select(Scalers.rendezvousShard(col("k"), 7).as("s"))
      .agg(min("s"), max("s"), count(lit(1))).head()
    assert(s.getInt(0) >= 0 && s.getInt(1) <= 6 && s.getLong(2) == 500)
  }

  test("ring: growing n to n+1 moves keys ONLY to the new shard (virtual nodes)") {
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"https://h$i.example/$i").toDF("k")
    val a = keys.select(
      Scalers.ringShard(col("k"), 10).as("s10"),
      Scalers.ringShard(col("k"), 11).as("s11"))
    val moved = a.where(col("s10") =!= col("s11"))
    assert(moved.where(col("s11") =!= 10).count() == 0)
    val nMoved = moved.count()
    // expected ~1/11 with virtual-node variance; wide deterministic band
    assert(nMoved > 2000 / 40 && nMoved < 2000 / 3, s"moved $nMoved")
    assert(a.where(col("s11") === 10).count() == nMoved)
  }

  test("ring: assignment is total and matches a JVM successor lookup") {
    import spark.implicits._
    val pts = (for { s <- 0 until 5; r <- 0 until 8 }
      yield (Scalers.md5Prefix15(s"ring:$s:$r"), s)).sortBy(p => (p._1, p._2))
    val keys = (0 until 300).map(i => s"k$i")
    val expected = keys.map { k =>
      val h = Scalers.md5Prefix15(k)
      // NOTE: the column family hashes md5(key) of the raw string
      k -> pts.find(_._1 >= h).getOrElse(pts.head)._2
    }.toMap
    val got = keys.toDF("k")
      .select(col("k"), Scalers.ringShard(col("k"), 5).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("gap quantiles: hand-computed histogram case") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1700000000000L
    // user 1, type "a": gaps 10s, 10s, 20s, 60s -> p50=10, p90=60, p99=60
    val rows = Seq(0L, 10L, 20L, 40L, 100L).zipWithIndex.map { case (s, i) =>
      (i.toLong, new Timestamp(base + s * 1000), 1L, "a", 0.0, "{}")
    } ++ Seq((9L, new Timestamp(base), 2L, "a", 0.0, "{}")) // single event: no gap
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.gapQuantiles(df).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "a" && row.getLong(1) == 4)
    assert((row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6)) == ((10L, 10L, 60L, 60L, 60L)))
  }

  test("shardMoveAudit per-shard totals reconcile with the flat assignment") {
    import spark.implicits._
    val keys = (0 until 1000).map(i => s"url$i").toDF("k")
    val audit = Scalers.shardMoveAudit(keys, "k", 5, 6, "md5prefix")
    val rows = audit.collect()
    assert(rows.map(_.getLong(1)).sum == 1000)
    val flatMoved = keys.select(
        Scalers.rendezvousShard(col("k"), 5, "md5prefix").as("a"),
        Scalers.rendezvousShard(col("k"), 6, "md5prefix").as("b"))
      .where(col("a") =!= col("b")).count()
    assert(rows.map(_.getLong(2)).sum == flatMoved)
  }
}
