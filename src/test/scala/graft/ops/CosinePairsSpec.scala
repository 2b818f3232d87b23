package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Weighted AllPairs cosine join (Bayardo WWW'07 prefix filter) vs an
  * independent single-threaded reference: same integer quantized-idf
  * weights, same BigInt threshold certificate, zero float anywhere.
  */
class CosinePairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("cosine-pairs-spec").getOrCreate()

  /** Reference: exact integer cosine certificate over all ordered pairs
    * (doc_a passes the probe filter). Returns (a, b) -> (dot, na2, nb2).
    */
  private def refPairs(docs: Seq[(Long, String)], tNum: Long, tDen: Long,
                       idfScale: Long,
                       probe: Long => Boolean): Map[(Long, Long), (Long, Long, Long)] = {
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val w = tf.map { case (id, m) =>
      id -> m.map { case (tok, f) => tok -> f * (idfScale / df(tok)) }
    }
    val norm2 = w.map { case (id, m) => id -> m.values.map(x => x * x).sum }
    (for {
      a <- docs.map(_._1) if probe(a)
      b <- docs.map(_._1) if a != b
      shared = w(a).keySet.intersect(w(b).keySet)
      dot = shared.toSeq.map(t => w(a)(t) * w(b)(t)).sum
      if dot > 0 &&
        BigInt(dot) * dot * tDen * tDen >= BigInt(norm2(a)) * norm2(b) * tNum * tNum
    } yield (a, b) -> (dot, norm2(a), norm2(b))).toMap
  }

  private val corpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank"
    val near = "the quick brown fox jumps over the lazy dog near the old river shore"
    val half = "quick brown fox sleeps under the old oak tree by the river"
    val other = (0L until 20L).map(i =>
      i + 10 -> s"unrelated document w${i}a w${i}b w${i}c w${i}d common filler words here")
    Seq(0L -> base, 1L -> near, 2L -> half, 3L -> base, 4L -> (base + " " + base)) ++ other
  }

  private def runSpark(tNum: Long, tDen: Long, idfScale: Long = 1000000L,
                       probeMod: Option[Long] = None,
                       parts: Int = 4): Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text").repartition(parts)
    val pf = probeMod.map(m => col("doc_id") % m === 0).getOrElse(lit(true))
    Dedup.cosineSimilarPairs(docs, tNum, tDen, idfScale, pf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("matches the brute-force integer reference at several thresholds") {
    for ((tn, td) <- Seq((3L, 5L), (4L, 5L), (99L, 100L), (1L, 10L))) {
      val got = runSpark(tn, td)
      val want = refPairs(corpus, tn, td, 1000000L, _ => true)
      assert(got === want, s"mismatch at threshold $tn/$td")
    }
  }

  test("near-duplicates pair, unrelated docs do not (t=3/5)") {
    val got = runSpark(3, 5)
    assert(got.contains((0L, 1L)) && got.contains((1L, 0L))) // one-word edit
    assert(got.contains((0L, 3L))) // exact duplicate
    assert(got.contains((0L, 4L))) // doubled text: same direction, cos = 1
    assert(!got.keySet.exists { case (a, b) => a >= 10 && b < 10 })
  }

  test("probe filter keeps only probe-side doc_a") {
    val got = runSpark(3, 5, probeMod = Some(2L))
    val want = refPairs(corpus, 3, 5, 1000000L, _ % 2 == 0)
    assert(got === want)
    assert(got.keys.forall(_._1 % 2 == 0))
  }

  test("deterministic across input partitioning") {
    assert(runSpark(3, 5, parts = 1) === runSpark(3, 5, parts = 13))
  }

  test("stopword-frequency tokens round to weight zero and cannot pair") {
    // idfScale below the df of the planted 'common filler words here'
    // block: every token shared across the 20 filler docs gets weight
    // idfScale div df = 0, so filler docs share nothing with weight > 0
    val got = runSpark(1, 10, idfScale = 4L)
    val want = refPairs(corpus, 1, 10, 4L, _ => true)
    assert(got === want)
    assert(!got.keySet.exists { case (a, b) => a >= 10 && b >= 10 })
  }

  test("rejects degenerate thresholds") {
    import spark.implicits._
    val d = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException](Dedup.cosineSimilarPairs(d, 0, 5))
    intercept[IllegalArgumentException](Dedup.cosineSimilarPairs(d, 6, 5))
    intercept[IllegalArgumentException](Dedup.cosineSimilarPairs(d, 1, 2, idfScale = 0))
  }
}
