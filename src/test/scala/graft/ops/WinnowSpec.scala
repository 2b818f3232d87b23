package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprint selection (Schleimer et al. 2003) vs an
  * independent single-threaded reference, plus the paper's detection
  * guarantee and the rightmost-min tie-break pinned explicitly.
  */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("winnow-spec").getOrCreate()

  /** Top 60 bits of md5 as a long — the md5prefix oracle family,
    * computed here with JDK primitives (independent of Spark's md5/conv).
    */
  private def md5prefix(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Reference winnowing: every window of w gram hashes contributes its
    * min (rightmost on ties); distinct (pos, hash) pairs.
    */
  private def refWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val hs = (0 to toks.length - k).map(i => md5prefix(toks.slice(i, i + k).mkString(" ")))
    val n = hs.length
    (0 to math.max(n - w, 0)).map { j =>
      val end = math.min(j + w - 1, n - 1)
      var bv = Long.MaxValue; var bp = -1
      for (i <- j to end) if (hs(i) <= bv) { bv = hs(i); bp = i }
      (bp, bv)
    }.toSet
  }

  private def docsDf(docs: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    docs.toDF("doc_id", "text")
  }

  private def run(docs: Seq[(Long, String)], k: Int, w: Int,
                  family: String = "md5prefix"): Map[Long, Set[(Int, Long)]] =
    TextOps.winnow(docsDf(docs), k, w, family).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }

  test("matches the independent reference on seeded random corpora (k/w sweep)") {
    val rnd = new scala.util.Random(42)
    // 8-word vocabulary forces repeated grams → genuine hash ties exercise
    // the rightmost tie-break; lengths straddle the no-gram / one-window /
    // many-window regimes
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docs = (0L until 40L).map { id =>
      val n = rnd.nextInt(30)
      id -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    for ((k, w) <- Seq((4, 4), (2, 3), (3, 1), (1, 5))) {
      val got = run(docs, k, w)
      val want = docs.map { case (id, t) => id -> refWinnow(t, k, w) }
        .filter(_._2.nonEmpty).toMap
      assert(got == want, s"mismatch at k=$k w=$w")
    }
  }

  test("guarantee: a shared run of >= w+k-1 tokens forces a shared fingerprint") {
    val rnd = new scala.util.Random(7)
    val k = 4; val w = 4
    val shared = (0 until (w + k - 1)).map(i => s"run$i").mkString(" ")
    def noise(n: Int) = (0 until n).map(_ => s"x${rnd.nextInt(100000)}").mkString(" ")
    val docs = Seq(
      0L -> (noise(20) + " " + shared + " " + noise(20)),
      1L -> (noise(35) + " " + shared + " " + noise(5)))
    val fps = run(docs, k, w)
    val common = fps(0L).map(_._2) intersect fps(1L).map(_._2)
    assert(common.nonEmpty, "shared w+k-1 run must yield a shared fingerprint")
  }

  test("rightmost-min tie-break: constant document selects each window's last slot") {
    // every gram identical → every hash ties → selection must be the
    // rightmost position of each window: w-1, w, ..., nG-1
    val k = 3; val w = 4; val n = 10 // nG = 8
    val docs = Seq(0L -> Seq.fill(n)("same").mkString(" "))
    val got = run(docs, k, w)(0L)
    val nG = n - k + 1
    val h = md5prefix(Seq.fill(k)("same").mkString(" "))
    assert(got == ((w - 1) until nG).map(p => (p, h)).toSet)
  }

  test("short docs: < k tokens invisible; >= 1 gram but < w grams gets one window") {
    val docs = Seq(
      0L -> "a b c",          // 3 tokens < k=4 → no grams
      1L -> "a b c d e")      // 2 grams < w=4 → one truncated window
    val got = run(docs, 4, 4)
    assert(!got.contains(0L))
    assert(got(1L) == refWinnow("a b c d e", 4, 4) && got(1L).size == 1)
  }

  test("xxhash64 production family selects a valid winnowing (density + positions)") {
    // positions differ from md5prefix (different hash order) but every
    // window must still be covered: consecutive selected positions can
    // never be more than w apart, and each selected pos carries the
    // xxhash64 of its own gram
    val rnd = new scala.util.Random(11)
    val text = (0 until 200).map(_ => s"t${rnd.nextInt(50)}").mkString(" ")
    val k = 4; val w = 5
    val got = TextOps.winnow(docsDf(Seq(0L -> text)), k, w, "xxhash64")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val poss = got.map(_._1).toSeq.sorted
    assert(poss.head < w, "first window must be covered")
    poss.sliding(2).foreach {
      case Seq(a, b) => assert(b - a <= w, s"gap $a->$b exceeds w")
      case _ =>
    }
    val nG = 200 - k + 1
    assert(poss.last >= nG - w, "last window must be covered")
  }

  test("winnowPairs finds planted near-dups and respects minShared") {
    val rnd = new scala.util.Random(5)
    def noise(n: Int, tag: String) =
      (0 until n).map(i => s"$tag${rnd.nextInt(100000)}").mkString(" ")
    val passage = (0 until 40).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      0L -> (noise(30, "a") + " " + passage),
      1L -> (passage + " " + noise(30, "b")),
      2L -> noise(60, "c")) // unrelated
    val pairs = TextOps.winnowPairs(docsDf(docs), k = 4, w = 4,
        minShared = 2, family = "md5prefix", capPerBucket = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 2)
  }

  test("winnowPairs hot-bucket cap bounds pair emission deterministically") {
    // 50 identical docs: every fingerprint bucket holds all 50 → uncapped
    // emits C(50,2)=1225 pairs; cap 8 keeps the lowest 8 doc_ids per
    // bucket → exactly C(8,2)=28 pairs, always among ids 0..7
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = (0L until 50L).map(id => id -> text)
    val pairs = TextOps.winnowPairs(docsDf(docs), k = 4, w = 4,
        minShared = 1, family = "md5prefix", capPerBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 28, s"got ${pairs.length} pairs")
    assert(pairs.forall { case (a, b) => a < 8 && b < 8 })
  }
}
