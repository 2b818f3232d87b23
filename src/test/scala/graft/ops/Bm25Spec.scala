package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Okapi BM25 (TextOps.bm25). */
class Bm25Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val corpus = Seq(
    (0L, "a a a b c"),   // dl 5
    (1L, "a b b d"),     // dl 4
    (2L, "c c c c c c")) // dl 6

  /** Plain-Scala reference with the exact same float ops (Spark's log is
    * StrictMath.log — matching it here makes the comparison EXACT, not
    * tolerance-based).
    */
  private def ref(k1: Double = 1.2, b: Double = 0.75): Map[(Long, String), Double] = {
    val docs = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = docs.size.toLong
    val dfm = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    val avgdl = docs.map(_._2.size).sum.toDouble / n.toDouble
    (for {
      (id, toks) <- docs
      (tok, tf) <- toks.groupBy(identity).view.mapValues(_.size.toLong)
    } yield {
      val df = dfm(tok)
      val idf = StrictMath.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
      val dl = toks.size.toDouble
      val tfd = tf.toDouble
      (id, tok) -> idf * ((tfd * (k1 + 1.0)) /
        (tfd + k1 * (1.0 - b + b * (dl / avgdl))))
    }).toMap
  }

  test("scores match the hand formula exactly; ranking and cut are correct") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val out = TextOps.bm25(docs, k = 2).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    val expected = ref()
    out.foreach { case ((id, tok), (_, _, _, score)) =>
      assert(score === expected((id, tok)), s"($id,$tok)")
    }
    // top-2 per doc by (score desc, tok asc)
    val byDoc = out.groupBy(_._1._1)
    assert(byDoc.forall(_._2.length <= 2))
    val d0 = byDoc(0L).map { case ((_, tok), (_, _, _, s)) => (tok, s) }.sortBy(-_._2)
    // doc 0: 'b'/'c' are rarer than 'a' (df 2 vs 2 vs 2? a:df2 b:df2 c:df2)
    // — the exact expectation comes from the reference ranking
    val expTop = expected.filter(_._1._1 == 0L).toSeq
      .sortBy { case ((_, t), s) => (-s, t) }.take(2).map(_._1._2).toSet
    assert(d0.map(_._1).toSet === expTop)
  }

  test("minDf trims the tail; rarer terms outscore common ones at equal tf") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val out = TextOps.bm25(docs, k = 10, minDf = 2L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // 'd' has df 1 -> trimmed everywhere
    assert(!out.exists(_._2 == "d"))
    val all = TextOps.bm25(docs, k = 10).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getDouble(5))).toMap
    // doc 1: 'd' (df 1) must outscore 'a' (df 2) at tf 1 each
    assert(all((1L, "d")) > all((1L, "a")))
  }
}
