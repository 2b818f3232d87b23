package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog sketch: a pure-JVM register reference for the md5prefix
  * family (bucket/rank bit-identity), the merge property (shard sketches
  * re-maxed ≡ whole-corpus sketch), summary arithmetic, and estimate
  * accuracy on known cardinalities.
  */
class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sketches-spec").getOrCreate()

  private val P = 9
  private val M = 1 << P

  /** JVM reference of the md5prefix register derivation. */
  private def refReg(key: String): (Long, Int) = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    val h60 = java.lang.Long.parseLong(hex, 16)
    val regNo = h60 & (M - 1)
    val rest = h60 >>> P
    val rank = if (rest == 0L) 52 else 52 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    (regNo, rank)
  }

  private def keysDf(keys: Seq[String]) = {
    import spark.implicits._
    keys.map(k => ("g", k)).toDF("grp", "key")
  }

  private def regsOf(keys: Seq[String]): Map[Long, Int] =
    Sketches.hllRegisters(keysDf(keys), "key", Seq("grp"), P, "md5prefix")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap

  test("registers match the pure-JVM md5prefix reference") {
    val keys = (0 until 300).map(i => s"key-$i")
    val want = keys.map(refReg)
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(regsOf(keys) === want)
  }

  test("rank takes the all-zero-suffix branch consistently with the ref") {
    // structural bounds on a larger corpus: every rank in [1, 52], every
    // bucket in [0, m)
    val regs = regsOf((0 until 5000).map(i => s"u$i"))
    assert(regs.keys.forall(b => b >= 0 && b < M))
    assert(regs.values.forall(r => r >= 1 && r <= 52))
  }

  test("shard sketches re-maxed equal the whole-corpus sketch") {
    val all = (0 until 2000).map(i => s"doc-$i")
    val (s1, s2) = all.splitAt(700)
    val whole = regsOf(all)
    val merged = (regsOf(s1).toSeq ++ regsOf(s2).toSeq)
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(merged === whole)
  }

  test("duplicates do not move the sketch") {
    val uniq = (0 until 500).map(i => s"x$i")
    assert(regsOf(uniq ++ uniq ++ uniq.take(100)) === regsOf(uniq))
  }

  test("summary arithmetic: zeros + nonzero = m, zint reconstructs") {
    val keys = (0 until 800).map(i => s"s$i")
    val regs = regsOf(keys)
    val sm = Sketches.hllSummary(
        Sketches.hllRegisters(keysDf(keys), "key", Seq("grp"), P, "md5prefix"),
        Seq("grp"), P)
      .collect()(0)
    val nonzero = sm.getLong(1); val zeros = sm.getLong(2)
    val zint = sm.getDecimal(3)
    assert(nonzero === regs.size.toLong)
    assert(zeros === (M - regs.size).toLong)
    val want = regs.values.map(r => BigInt(1) << (52 - r)).sum +
      BigInt(M - regs.size) * (BigInt(1) << 52)
    assert(BigInt(zint.toBigInteger) === want)
  }

  test("estimate lands within 10% on known cardinalities") {
    for (n <- Seq(200, 1000, 5000)) {
      val keys = (0 until n).map(i => s"est-$i-$n")
      val est = Sketches.hllEstimate(
          Sketches.hllSummary(
            Sketches.hllRegisters(keysDf(keys), "key", Seq("grp"), P, "md5prefix"),
            Seq("grp"), P),
          P)
        .collect()(0).getDouble(4)
      assert(math.abs(est - n) / n < 0.10,
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("CMS registers total depth*N and never underestimate a probe") {
    import spark.implicits._
    // zipf-ish: key i appears 200/i times
    val keys = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"k$i"))
    val df = keys.map(k => ("g", k)).toDF("grp", "key")
    val regs = Sketches.cmsRegisters(df, "key", Seq("grp"), 64, 4, "md5prefix")
    val rows = regs.collect()
    // each depth row partitions the stream: its counters sum to N
    val byDepth = rows.groupBy(_.getInt(1))
      .map { case (d, rs) => d -> rs.map(_.getLong(3)).sum }
    assert(byDepth === (0 until 4).map(_ -> keys.size.toLong).toMap)
    val exact = keys.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val probes = exact.keys.toSeq.map(k => ("g", k)).toDF("grp", "key")
    val est = Sketches.cmsEstimate(regs, probes, "key", Seq("grp"), 64, 4, "md5prefix")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    for ((k, c) <- exact) {
      assert(est(k) >= c, s"$k underestimated: ${est(k)} < $c")
      assert(est(k) <= c + 2L * keys.size / 64 + 50,
        s"$k overestimate implausibly large: ${est(k)} vs $c")
    }
    // an absent key estimates at most the collision noise (and >= 0)
    val ghost = Sketches.cmsEstimate(regs,
        Seq(("g", "never-seen")).toDF("grp", "key"),
        "key", Seq("grp"), 64, 4, "md5prefix")
      .collect()(0).getLong(2)
    assert(ghost >= 0L && ghost <= 2L * keys.size / 64 + 50)
  }

  test("CMS shard sketches merge by bucket-wise addition") {
    import spark.implicits._
    val all = (0 until 900).map(i => ("g", s"m${i % 70}"))
    val (s1, s2) = all.splitAt(333)
    def regsOf(rows: Seq[(String, String)]): Map[(Int, Long), Long] =
      Sketches.cmsRegisters(rows.toDF("grp", "key"), "key", Seq("grp"),
          32, 3, "xxhash64")
        .collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val whole = regsOf(all)
    val merged = (regsOf(s1).toSeq ++ regsOf(s2).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged === whole)
  }

  /** 60-bit md5prefix hash, the JVM reference for KMV. */
  private def h60(key: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def kmvOf(keys: Seq[String], k: Int): Seq[(Int, Long)] =
    Sketches.kmvRegisters(keysDf(keys), "key", Seq("grp"), k, "md5prefix")
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)

  test("KMV registers are the bottom-k of the JVM reference hash set") {
    val keys = (0 until 400).map(i => s"kmv-$i")
    val want = keys.map(h60).distinct.sorted.take(16).zipWithIndex
      .map { case (h, i) => (i + 1, h) }
    assert(kmvOf(keys, 16) === want)
  }

  test("KMV shard sketches merge by union + re-rank") {
    val all = (0 until 3000).map(i => s"m-$i")
    val (s1, s2) = all.splitAt(1100)
    val whole = kmvOf(all, 32)
    val merged = (kmvOf(s1, 32) ++ kmvOf(s2, 32)).map(_._2)
      .distinct.sorted.take(32).zipWithIndex.map { case (h, i) => (i + 1, h) }
    assert(merged === whole)
  }

  test("KMV duplicates do not move the sketch; below-k groups are exact") {
    val uniq = (0 until 10).map(i => s"d$i")
    assert(kmvOf(uniq ++ uniq ++ uniq, 16) === kmvOf(uniq, 16))
    val est = Sketches.kmvEstimate(
        Sketches.kmvRegisters(keysDf(uniq), "key", Seq("grp"), 16, "md5prefix"),
        Seq("grp"), 16)
      .collect()(0)
    assert(est.getLong(1) === 10L)      // n_slots
    assert(est.isNullAt(2))             // kth absent below k
    assert(est.getLong(3) === 10L)      // est EXACT below k
  }

  test("KMV integer estimate lands within 30% on known cardinalities") {
    for (family <- Seq("md5prefix", "xxhash64"); n <- Seq(500, 5000)) {
      val keys = (0 until n).map(i => s"e-$family-$i")
      val row = Sketches.kmvEstimate(
          Sketches.kmvRegisters(keysDf(keys), "key", Seq("grp"), 64, family),
          Seq("grp"), 64)
        .collect()(0)
      val est = row.getLong(3)
      assert(math.abs(est - n).toDouble / n < 0.30,
        s"family=$family n=$n est=$est")
      // estimator replay: ⌊63·2^60 / kth⌋
      val kth = row.getLong(2)
      assert(est === (BigInt(63) * (BigInt(1) << 60) / kth).toLong)
    }
  }

  test("xxhash64 production family produces a valid, merge-stable sketch") {
    import spark.implicits._
    val df = (0 until 1500).map(i => ("g", s"p$i")).toDF("grp", "key")
    val regs = Sketches.hllRegisters(df, "key", Seq("grp"), P, "xxhash64")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(regs.keys.forall(b => b >= 0 && b < M))
    assert(regs.values.forall(r => r >= 1 && r <= 52))
    val est = Sketches.hllEstimate(
        Sketches.hllSummary(
          Sketches.hllRegisters(df, "key", Seq("grp"), P, "xxhash64"),
          Seq("grp"), P),
        P)
      .collect()(0).getDouble(4)
    assert(math.abs(est - 1500) / 1500.0 < 0.10, s"est=$est")
  }
}
