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
}
