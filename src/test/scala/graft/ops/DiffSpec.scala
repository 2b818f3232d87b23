package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Crawl snapshot diff: all four statuses on hand fixtures, latest-wins
  * collapse inside each snapshot, and canonicalization folding across
  * snapshots.
  */
class DiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("diff-spec").getOrCreate()

  private def run(before: Seq[(Long, String, Long, String)],
                  after: Seq[(Long, String, Long, String)]): Map[String, String] = {
    import spark.implicits._
    WebOps.snapshotDiff(
        before.toDF("doc_id", "url", "warc_sec", "text"),
        after.toDF("doc_id", "url", "warc_sec", "text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("all four statuses") {
    val before = Seq(
      (1L, "https://h.example/keep", 10L, "same"),
      (2L, "https://h.example/edit", 10L, "old"),
      (3L, "https://h.example/gone", 10L, "bye"))
    val after = Seq(
      (4L, "https://h.example/keep", 20L, "same"),
      (5L, "https://h.example/edit", 20L, "new"),
      (6L, "https://h.example/born", 20L, "hi"))
    assert(run(before, after) === Map(
      "h.example/keep" -> "unchanged",
      "h.example/edit" -> "changed",
      "h.example/gone" -> "removed",
      "h.example/born" -> "added"))
  }

  test("latest fetch wins inside each snapshot") {
    // before: page fetched twice, latest content "B"; after serves "B"
    // -> unchanged despite the stale "A"
    val before = Seq(
      (1L, "https://h.example/p", 10L, "A"),
      (2L, "https://h.example/p", 11L, "B"))
    val after = Seq((3L, "https://h.example/p", 20L, "B"))
    assert(run(before, after) === Map("h.example/p" -> "unchanged"))
    // and the mirror case: stale matches, latest differs -> changed
    val after2 = Seq(
      (3L, "https://h.example/p", 20L, "A"),
      (4L, "https://h.example/p", 21L, "C"))
    assert(run(before, after2) === Map("h.example/p" -> "changed"))
  }

  test("canonicalization folds URL variants across snapshots") {
    val before = Seq((1L, "https://www.h.example/p", 10L, "x"))
    val after = Seq((2L, "http://h.example/p/", 20L, "x"))
    assert(run(before, after) === Map("h.example/p" -> "unchanged"))
  }
}
