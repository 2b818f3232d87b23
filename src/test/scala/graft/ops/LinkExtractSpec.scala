package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** href harvesting for link-graph construction: document-order
  * ordinals, attribute noise, the documented double-quote-only scope,
  * and binary html input.
  */
class LinkExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("link-extract-spec").getOrCreate()

  private def links(html: String): Seq[(Int, String)] = {
    import spark.implicits._
    WebOps.extractLinks(Seq((1L, html)).toDF("doc_id", "html"), "html")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq.sortBy(_._1)
  }

  test("extracts hrefs in document order, skipping non-anchor tags") {
    val html = """<body><a class="nav" rel="x" href="https://a/1">one</a>
      |<img src="skip.png"/><link href="style.css"/>
      |<a href="https://b/2">two</a><a href="/rel">three</a></body>""".stripMargin
    assert(links(html) === Seq((0, "https://a/1"), (1, "https://b/2"), (2, "/rel")))
  }

  test("double-quote-only scope: single-quoted and unquoted hrefs are skipped") {
    assert(links("""<a href='https://x/1'>a</a><a href=bare>b</a>""") === Seq())
  }

  test("no anchors -> no rows; empty href matched as empty string") {
    assert(links("<p>plain</p>") === Seq())
    assert(links("""<a href="">self</a>""") === Seq((0, "")))
  }

  test("binary html column casts to string before extraction") {
    import spark.implicits._
    val df = Seq((7L, """<a href="https://h/x">t</a>""".getBytes("UTF-8")))
      .toDF("doc_id", "html")
    val got = WebOps.extractLinks(df, "html").collect()
    assert(got.length === 1 && got(0).getString(2) === "https://h/x")
  }

  private def anchors(html: String): Seq[(Int, String, String)] = {
    import spark.implicits._
    WebOps.extractAnchors(Seq((1L, html)).toDF("doc_id", "html"), "html")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3)))
      .toSeq.sortBy(_._1)
  }

  test("extractAnchors pairs href with its own anchor text, in order") {
    val html = """<a class="x" href="https://a/1">one two</a><p>mid</p>""" +
      """<a href="https://b/2" id="z">three</a>"""
    assert(anchors(html) === Seq((0, "https://a/1", "one two"),
      (1, "https://b/2", "three")))
  }

  test("anchors wrapping child markup yield no row (documented scope)") {
    // extractLinks still harvests the href; extractAnchors trades that
    // recall for the exact text signal
    val html = """<a href="https://m/1"><b>bold</b></a><a href="https://t/2">t</a>"""
    assert(anchors(html) === Seq((0, "https://t/2", "t")))
    assert(links(html).map(_._2) === Seq("https://m/1", "https://t/2"))
  }

  test("empty anchor text is a row with an empty string") {
    assert(anchors("""<a href="https://e/1"></a>""") === Seq((0, "https://e/1", "")))
  }

  test("anchorTermIndex: counts across pages, rank ties break on term") {
    import spark.implicits._
    val rows = Seq(
      (1L, """<a href="h1">alpha beta</a>"""),
      (2L, """<a href="h1">alpha</a><a href="h2">solo</a>"""),
      (3L, """<a href="h1">beta gamma</a>"""))
    val idx = WebOps.anchorTermIndex(
      WebOps.extractAnchors(rows.toDF("doc_id", "html"), "html"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    // h1: alpha 2, beta 2 (tie -> alpha first), gamma cut by k=2
    assert(idx === Seq(("h1", "alpha", 2L, 1), ("h1", "beta", 2L, 2),
      ("h2", "solo", 1L, 1)))
  }
}
