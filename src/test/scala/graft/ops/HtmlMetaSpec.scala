package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Head-metadata extraction: all-fields, missing-fields-as-'', and
  * first-match-wins on duplicated elements.
  */
class HtmlMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("htmlmeta-spec").getOrCreate()

  private def run(rows: Seq[(Long, String)]): Map[Long, (String, String, String, String)] = {
    import spark.implicits._
    WebOps.htmlMeta(rows.toDF("doc_id", "h")
        .select(col("doc_id"), encode(col("h"), "UTF-8").as("html")))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getString(4))))
      .toMap
  }

  test("all four fields extract") {
    val h = """<html><head><title>T</title>""" +
      """<meta name="description" content="D"/>""" +
      """<link rel="canonical" href="https://c.example/x"/>""" +
      """<meta charset="utf-8"/></head><body>b</body></html>"""
    assert(run(Seq((1L, h)))(1L) ===
      (("T", "D", "https://c.example/x", "utf-8")))
  }

  test("missing fields come back as empty strings, never null") {
    val h = "<html><head></head><body>no head data</body></html>"
    assert(run(Seq((1L, h)))(1L) === (("", "", "", "")))
  }

  test("first match wins on duplicated titles") {
    val h = "<title>first</title><title>second</title>"
    assert(run(Seq((1L, h)))(1L)._1 === "first")
  }

  test("url features: depth, digits, query, extension on hand URLs") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://a.example/blog/2024/03/x1.html?utm=1#frag"),
      (2L, "https://a.example/"),
      (3L, "http://b.example"),
      (4L, "https://b.example/p123"))
    val got = WebOps.urlFeatures(rows.toDF("doc_id", "url"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6), r.getBoolean(7))))
      .toMap
    assert(got(1L) === (("/blog/2024/03/x1.html", 4L, 21L, 7L, true, true)))
    assert(got(2L) === (("/", 1L, 1L, 0L, false, false)))
    assert(got(3L) === (("/", 1L, 1L, 0L, false, false))) // hostname-only
    assert(got(4L) === (("/p123", 1L, 5L, 3L, false, false)))
  }
}
