package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** PMI collocations: a brute-force Scala reference (BigInt arithmetic,
  * same floor-division score), hand-ranked fixtures where the PMI order
  * inverts the raw-frequency order, threshold and boundary-tie cases,
  * and empty/single-token docs.
  */
class CollocationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("collocation-spec").getOrCreate()

  private def run(docs: Seq[String], minCount: Long = 2, topK: Int = 100)
      : Seq[(String, String, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextOps.collocations(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        minCount, topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
  }

  private def brute(docs: Seq[String], minCount: Long, topK: Int)
      : Seq[(String, String, Long, Long, Long, Long)] = {
    val tokDocs = docs.map(_.split(" ").filter(_.nonEmpty).toSeq)
    val uni = tokDocs.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val n = BigInt(uni.values.sum)
    val bi = tokDocs.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      .filter(_._2 >= minCount)
    bi.toSeq.map { case ((w1, w2), cxy) =>
      val score = (BigInt(cxy) * n * 1000000000) /
        (BigInt(uni(w1)) * BigInt(uni(w2)))
      (w1, w2, cxy, uni(w1), uni(w2), score.toLong)
    }.sortBy(t => (-t._6, t._1, t._2)).take(topK)
  }

  test("PMI order inverts raw frequency: rare-but-exclusive pair wins") {
    // "new york" appears 3x and its words appear nowhere else;
    // "the cat" appears 4x but 'the' is everywhere -> lower PMI
    val docs = Seq(
      "new york new york new york",
      "the cat sat and the cat ran and the cat hid the dog",
      "the end the end the end")
    val got = run(docs, minCount = 2)
    assert(got.head._1 === "new" && got.head._2 === "york")
    val scores = got.map(_._6)
    assert(scores === scores.sorted.reverse, "descending score order")
    assert(got === brute(docs, 2, 100))
  }

  test("brute-force differential on a deterministic synthetic corpus") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0 until 60).map { d =>
      (0 until 30).map(i => words(((d * 31 + i * i * 7 + 3) % 17) % 6))
        .mkString(" ")
    }
    assert(run(docs, minCount = 3, topK = 20) === brute(docs, 3, 20))
  }

  test("minCount prunes and the top-k boundary tie-breaks on the pair") {
    val docs = Seq("a b a b a c", "a c d e d e")
    // bigrams: (a,b)x2 (b,a)x2 (a,c)x2 (c,d) (d,e)x2 (e,d) — minCount=2
    // keeps 4 pairs
    val got = run(docs, minCount = 2, topK = 4)
    assert(got.size === 4)
    assert(got === brute(docs, 2, 4))
    val top2 = run(docs, minCount = 2, topK = 2)
    assert(top2 === brute(docs, 2, 2))
  }

  test("empty and single-token docs contribute no bigrams") {
    // "x y x y": (x,y) twice, (y,x) once -> only (x,y) survives minCount=2
    val got = run(Seq("", "solo", "x y x y"), minCount = 2)
    assert(got.map(t => (t._1, t._2)) === Seq(("x", "y")))
  }
}
