package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 64-bit SimHash (Manku et al., WWW'07) + pigeonhole hamming pairs.
  * The oracle query (`dedup_simhash_pairs`) checks engine-vs-DuckDB
  * parity against a brute-force all-pairs SQL join; this spec pins
  * (1) the fingerprint itself against an independent JVM MessageDigest
  * reference for the md5prefix family (bit-identity, including the
  * two's-complement bit 63), (2) banded join ≡ brute force for both
  * hash families, (3) the deterministic hot-bucket cap semantics.
  */
class SimhashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic token-salad corpus with planted near-dups: doc i+1000
    * is doc i with exactly one token swapped, so its fingerprint sits a
    * few bits away (usually ≤ 3 on a 60-token doc).
    */
  private def corpus(nDocs: Int, nToks: Int): Seq[(Long, String)] = {
    def tok(i: Long, j: Int): String = {
      val r = (i * 1000003L + j * 7919L) % 997L
      s"w$r"
    }
    val base = (0 until nDocs).map { i =>
      (i.toLong, (0 until nToks).map(j => tok(i.toLong, j)).mkString(" "))
    }
    val nearDups = (0 until nDocs / 4).map { i =>
      val toks = (0 until nToks).map(j => tok(i.toLong, j)).toArray
      toks(i % nToks) = s"zq$i" // one-token edit
      ((i + 1000).toLong, toks.mkString(" "))
    }
    base ++ nearDups
  }

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Independent md5prefix-family reference: JVM MessageDigest, plain
    * Scala majority vote, two's-complement Long assembly.
    */
  private def refSimhash64(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Long](64)
    text.split(" ").filter(_.nonEmpty).foreach { tok =>
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hi = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val lo = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      var b = 0
      while (b < 64) {
        val bit = if (b < 32) (lo >>> b) & 1L else (hi >>> (b - 32)) & 1L
        sums(b) += (if (bit == 1L) 1L else -1L)
        b += 1
      }
    }
    (0 until 64).foldLeft(0L) { (acc, b) =>
      if (sums(b) > 0) acc | (1L << b) else acc
    }
  }

  private def brutePairs(hashes: Map[Long, Long], maxDist: Int): Set[(Long, Long, Int)] = {
    val ids = hashes.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      d = java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j)))
      if d <= maxDist
    } yield (ids(i), ids(j), d)).toSet
  }

  test("simhash64 md5prefix family is bit-identical to an independent JVM reference") {
    val rows = corpus(24, 40)
    val got = Dedup.simhash64(docsDF(rows), family = "md5prefix").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = rows.map { case (id, text) => id -> refSimhash64(text) }.toMap
    assert(got == exp)
    // the corpus must exercise the two's-complement branch: at least one
    // fingerprint with bit 63 set (negative as a Long)
    assert(exp.values.exists(_ < 0L), "fixture never set bit 63 — weaken nothing, regenerate")
  }

  test("simhashPairs equals brute force exactly at maxDist 3, both families") {
    val rows = corpus(32, 60)
    val df = docsDF(rows)
    for (family <- Seq("md5prefix", "xxhash64")) {
      val hashes = Dedup.simhash64(df, family).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = brutePairs(hashes, 3)
      val got = Dedup.simhashPairs(df, maxDist = 3, capPerBucket = -1, family = family)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == exp, s"family=$family")
      assert(got.nonEmpty, s"family=$family planted near-dups found no pairs — fixture too weak")
    }
  }

  test("one-token edits land within the WWW'07 near-dup horizon on this fixture") {
    val rows = corpus(16, 60)
    val got = Dedup.simhashPairs(docsDF(rows), family = "xxhash64")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair (i, i+1000) whose brute distance is <= 3 must be
    // found; require that at least half the planted edits landed inside
    // the horizon (a one-token edit on 60 tokens flips few majority votes)
    val planted = (0 until 4).map(i => (i.toLong, (i + 1000).toLong))
    val found = planted.count(got.contains)
    assert(found * 2 >= planted.size, s"only $found of ${planted.size} planted pairs found")
  }

  test("hot-bucket cap bounds output deterministically; either-endpoint recall holds") {
    import spark.implicits._
    // 40 identical docs -> identical fingerprints -> one white-hot bucket
    val hot = (0L until 40L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val outsider = Seq((99L, "alpha beta gamma delta epsilon zeta")) // same text, also in bucket
    val df = (hot ++ outsider).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(df, capPerBucket = 4, family = "xxhash64").collect()
    // index side capped at 4 lowest ids -> every doc pairs with ids {0,1,2,3}
    // (minus self), never the full quadratic set
    assert(capped.length <= 41 * 4)
    val got = capped.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 99L)), "either-endpoint recall lost the capped outsider pair")
    val uncapped = Dedup.simhashPairs(df, capPerBucket = -1, family = "xxhash64").count()
    assert(uncapped == 41L * 40L / 2L)
  }
}
