package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Language-mix Gini (exact ppm values on hand distributions) and
  * template fingerprinting (grouping, text-independence, tag scoping).
  */
class HostMixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("hostmix-spec").getOrCreate()

  test("gini ppm exact on hand distributions") {
    import spark.implicits._
    val rows =
      Seq.fill(4)(("https://pure.example/x", "en")) ++
      Seq(("https://even.example/x", "en"), ("https://even.example/x", "de")) ++
      Seq(("https://tri.example/x", "en"), ("https://tri.example/x", "de"),
        ("https://tri.example/x", "fr"))
    val got = WebOps.hostLangMix(rows.toDF("url", "lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("pure.example") === ((4L, 1L, 0L)))          // 1 - 1 = 0
    assert(got("even.example") === ((2L, 2L, 500000L)))     // 1 - 1/2
    assert(got("tri.example") === ((3L, 3L, 666666L)))      // floor(2/3 ppm)
  }

  test("dup report: exact ppm on hand distributions") {
    import spark.implicits._
    val rows =
      Seq(("https://a.example/1", "same"), ("https://a.example/2", "same"),
        ("https://a.example/3", "same"), ("https://a.example/4", "other")) ++
      Seq(("https://b.example/1", "x"), ("https://b.example/2", "y"))
    val got = WebOps.hostDupReport(rows.toDF("url", "text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a.example") === ((4L, 2L, 500000L))) // 2 dup of 4
    assert(got("b.example") === ((2L, 2L, 0L)))
  }

  test("templates group by tag sequence, independent of text content") {
    import spark.implicits._
    val rows = Seq(
      (1L, "<html><body><p>alpha</p></body></html>"),
      (2L, "<html><body><p>completely different words</p></body></html>"),
      (3L, "<html><body><div>x</div></body></html>"))
    val got = WebOps.templateTable(rows.toDF("doc_id", "h")
        .select(col("doc_id"), encode(col("h"), "UTF-8").as("html")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // docs 1,2 share a template (example = 1); doc 3 is its own
    assert(got.toSet === Set((2L, 1L), (1L, 3L)))
  }

  test("closing tags and uppercase noise do not enter the fingerprint") {
    import spark.implicits._
    val rows = Seq(
      (1L, "<p>a</p>"),
      (2L, "<p>b</p><P>SHOUTING IS NOT A TAG START HERE</P>"))
    val got = WebOps.templateTable(rows.toDF("doc_id", "h")
        .select(col("doc_id"), encode(col("h"), "UTF-8").as("html")))
      .collect()
    // both reduce to the single opening tag "p" -> one template
    assert(got.length === 1 && got(0).getLong(1) === 2L)
  }
}
