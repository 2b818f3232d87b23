package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Stupid-backoff bigram scoring pinned by hand arithmetic: the seen-
  * bigram ratio branch, the 0.4-backoff branch, OOV zeros, short docs,
  * and the in-reference self-score sanity (reference text scores the
  * full transition probability).
  */
class LmScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("lmscore-spec").getOrCreate()

  private def run(docs: Seq[(Long, String)], ref: Seq[String])
      : Map[Long, (Long, Long)] = {
    import spark.implicits._
    TextOps.lmScore(
        docs.toDF("doc_id", "text"),
        ref.zipWithIndex.map { case (t, i) => (1000L + i, t) }
          .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  // reference: "a b a b a c" -> unigrams a:3 b:2 c:1, N=6;
  // bigrams (a,b):2 (b,a):2 (a,c):1
  private val ref = Seq("a b a b a c")

  test("seen bigram scores the exact count ratio") {
    // (a,b): 2*1e9 div 3 = 666666666
    val got = run(Seq((1L, "a b")), ref)
    assert(got(1L) === ((1L, 666666666L)))
  }

  test("unseen bigram of seen words takes the 0.4 unigram backoff") {
    // (c,a) unseen; backoff on 'a': 3*4e8 div 6 = 200000000
    val got = run(Seq((1L, "c a")), ref)
    assert(got(1L) === ((1L, 200000000L)))
  }

  test("OOV next word scores zero; sums accumulate per position") {
    // "a z b": (a,z) unseen + z OOV -> 0; (z,b) unseen -> backoff on b:
    // 2*4e8 div 6 = 133333333
    val got = run(Seq((1L, "a z b")), ref)
    assert(got(1L) === ((2L, 133333333L)))
  }

  test("short docs score (0, 0)") {
    val got = run(Seq((1L, ""), (2L, "solo")), ref)
    assert(got(1L) === ((0L, 0L)))
    assert(got(2L) === ((0L, 0L)))
  }

  test("the reference text itself scores every transition") {
    // "a b a b a c": (a,b)=666666666 ×2, (b,a)=2e9 div 2=1000000000 ×2,
    // (a,c)=1e9 div 3=333333333
    val got = run(Seq((1L, "a b a b a c")), ref)
    assert(got(1L) === ((5L,
      2 * 666666666L + 2 * 1000000000L + 333333333L)))
  }
}
