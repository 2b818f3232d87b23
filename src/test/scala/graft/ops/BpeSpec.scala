package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("bpe-spec").getOrCreate()

  /** Independent single-threaded BPE trainer (plain collections; shares
    * only the symbol/merge primitives with the engine). Argmax tie-break:
    * (count desc, left asc, right asc) — the engine's contract.
    */
  private def refBpe(corpus: Seq[String], nMerges: Int,
                     minCount: Long): Seq[(Int, String, String, Long, String)] = {
    val wc = scala.collection.mutable.LinkedHashMap[String, Long]()
    corpus.flatMap(_.split(" ").filter(_.nonEmpty))
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)
    var words: Seq[(Array[String], Long)] =
      wc.toSeq.map { case (w, c) => (TextOps.bpeSymbols(w), c) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, String)]()
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        (0 until syms.length - 1).foreach { i =>
          val k = (syms(i), syms(i + 1)); pc(k) = pc.getOrElse(k, 0L) + c
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((a, b), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minCount) done = true
        else {
          out += ((rank, a, b, cnt, a + b))
          words = words.map { case (s, c) => (TextOps.bpeApplyMerge(s, a, b), c) }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low", "lower lower newest newest", "newest newest newest newest",
    "widest widest widest", "low lower newest widest", "the the the the the the",
    "then then there there", "news newest new new new")

  test("bpeTrain matches the independent reference merge-for-merge") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, nMerges = 15).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4))).toSeq
    val want = refBpe(corpus, 15, 2L)
    assert(got == want)
    assert(got.size == 15) // the corpus supports all requested merges
  }

  test("bpeTrain deterministic across parallelism levels") {
    import spark.implicits._
    def run(parts: Int) = {
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(parts)
      TextOps.bpeTrain(docs, nMerges = 10).orderBy("rank").collect()
        .map(_.toSeq).toSeq
    }
    assert(run(1) == run(7))
  }

  test("bpeTrain stops when no pair reaches minPairCount") {
    import spark.implicits._
    val docs = Seq((0L, "ab cd ef")).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, nMerges = 50, minPairCount = 2L).collect()
    assert(got.isEmpty) // every pair occurs once
  }

  test("bpeSymbols/bpeApplyMerge: concat invariant and surrogate safety") {
    val s = TextOps.bpeSymbols("ab😀c")
    assert(s.toSeq == Seq("a", "b", "😀", "c", TextOps.BpeEow))
    val merged = TextOps.bpeApplyMerge(s, "a", "b")
    assert(merged.mkString == "ab😀c" + TextOps.BpeEow)
    // leftmost-greedy, non-overlapping: aaa + (a,a) -> [aa, a]
    assert(TextOps.bpeApplyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
  }

  test("bpeEncode: token counts shrink as merges apply; md5 deterministic across parallelism") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, nMerges = 10).orderBy("rank")
      .select("left", "right").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    def run(parts: Int) =
      TextOps.bpeEncode(docs.repartition(parts), merges).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
    val zero = TextOps.bpeEncode(docs, Seq.empty).orderBy("doc_id").collect()
    val enc = run(1)
    assert(enc == run(5))
    // with zero merges every token is chars+eow; merges only reduce counts
    zero.zip(enc).foreach { case (z, e) =>
      assert(e(1).asInstanceOf[Long] <= z.getLong(1))
    }
  }

  test("bpeEncode column chain matches a per-word reference segmentation") {
    import spark.implicits._
    // independent reference: apply merges on symbol arrays per word
    val merges = Seq(("t", "h"), ("th", "e"), ("the", TextOps.BpeEow), ("e", "n"))
    val texts = Seq("the then hen", "  the  the ", "thee", "😀 the 😀😀", "")
    def refCount(text: String): Long =
      text.split(" ").filter(_.nonEmpty).map { w =>
        var syms = TextOps.bpeSymbols(w)
        merges.foreach { case (a, b) => syms = TextOps.bpeApplyMerge(syms, a, b) }
        syms.length.toLong
      }.sum
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.bpeEncode(docs, merges).orderBy("doc_id").collect()
    texts.zip(got).foreach { case (t, row) =>
      assert(row.getLong(1) == refCount(t), s"text '$t'")
    }
    // hand check: the->the</w>(1), then->th e n</w>(3), hen->h e n</w>(3)
    assert(got(0).getLong(1) == 7L)
  }
}
