package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Host-level boilerplate line removal pinned on hand fixtures: the
  * integer frequency threshold (boundary-exact), per-page counting of
  * repeated lines, the minHostDocs guard, all-boilerplate pages, document
  * order of survivors, and per-host (not global) frequency scoping.
  */
class BoilerplateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("boilerplate-spec").getOrCreate()

  private def run(rows: Seq[(Long, String, String)],
                  fracNum: Int = 1, fracDen: Int = 2,
                  minHostDocs: Int = 2): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    WebOps.stripBoilerplate(rows.toDF("doc_id", "url", "text"),
        fracNum, fracDen, minHostDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("threshold is exact: 2/4 pages hits 1/2, 1/4 does not") {
    val rows = Seq(
      (1L, "https://h.example/1", "common\nunique one"),
      (2L, "https://h.example/2", "common\nunique two"),
      (3L, "https://h.example/3", "rare\nunique three"),
      (4L, "https://h.example/4", "unique four"))
    val got = run(rows)
    // "common" in 2/4 pages: 2*2 >= 4*1 -> dropped. "rare" in 1/4: kept.
    assert(got(1L) === (("unique one", 1L, 1L)))
    assert(got(2L) === (("unique two", 1L, 1L)))
    assert(got(3L) === (("rare\nunique three", 2L, 0L)))
    assert(got(4L) === (("unique four", 1L, 0L)))
  }

  test("a line repeated inside one page counts that page once") {
    val rows = Seq(
      (1L, "https://h.example/1", "banner\nbanner\nbanner\nbody a"),
      (2L, "https://h.example/2", "body b"),
      (3L, "https://h.example/3", "body c"))
    // banner appears in 1/3 pages (occurrences don't inflate it): 1*2 < 3
    val got = run(rows)
    assert(got(1L) === (("banner\nbanner\nbanner\nbody a", 4L, 0L)))
  }

  test("all occurrences drop once a line is boilerplate") {
    // banner in 2/3 pages (2*2 >= 3) -> boilerplate; each body line is in
    // 1/3 (1*2 < 3) -> kept; page 1's BOTH banner occurrences drop
    val rows = Seq(
      (1L, "https://h.example/1", "banner\nbody a\nbanner"),
      (2L, "https://h.example/2", "banner\nbody b"),
      (3L, "https://h.example/3", "body c"))
    val got = run(rows)
    assert(got(1L) === (("body a", 1L, 2L)))
    assert(got(2L) === (("body b", 1L, 1L)))
    assert(got(3L) === (("body c", 1L, 0L)))
  }

  test("minHostDocs guard: single-page hosts are never stripped") {
    val rows = Seq((1L, "https://solo.example/1", "anything\nanything"))
    // the page's only line trivially hits any frequency threshold, but
    // the host has 1 page < minHostDocs=2
    val got = run(rows)
    assert(got(1L) === (("anything\nanything", 2L, 0L)))
  }

  test("a page of pure boilerplate survives as an empty row") {
    val rows = Seq(
      (1L, "https://h.example/1", "footer"),
      (2L, "https://h.example/2", "footer"),
      (3L, "https://h.example/3", "footer\nreal content"))
    val got = run(rows)
    assert(got(1L) === (("", 0L, 1L)))
    assert(got(3L) === (("real content", 1L, 1L)))
  }

  test("frequency scope is per host: the same string survives elsewhere") {
    val rows = Seq(
      (1L, "https://a.example/1", "shared\nbody a1"),
      (2L, "https://a.example/2", "shared\nbody a2"),
      (3L, "https://a.example/3", "shared\nbody a3"),
      (4L, "https://b.example/1", "shared\nbody b1"),
      (5L, "https://b.example/2", "body b2"),
      (6L, "https://b.example/3", "body b3"),
      (7L, "https://b.example/4", "body b4"))
    val got = run(rows)
    // host a: shared in 3/3 -> dropped; host b: shared in 1/4 -> kept
    assert(got(1L) === (("body a1", 1L, 1L)))
    assert(got(4L) === (("shared\nbody b1", 2L, 0L)))
  }

  test("survivors keep document order across a dropped middle line") {
    // mid in 2/3 pages -> dropped; first/last in 1/3 -> kept, in order
    val rows = Seq(
      (1L, "https://h.example/1", "first\nmid\nlast"),
      (2L, "https://h.example/2", "mid"),
      (3L, "https://h.example/3", "solo"))
    val got = run(rows)
    assert(got(1L) === (("first\nlast", 2L, 1L)))
  }

  test("stricter fraction 3/4 spares a half-frequency line") {
    val rows = Seq(
      (1L, "https://h.example/1", "promo\nbody 1"),
      (2L, "https://h.example/2", "promo\nbody 2"),
      (3L, "https://h.example/3", "body 3"),
      (4L, "https://h.example/4", "body 4"))
    // promo in 2/4: 2*4 < 4*3 under 3/4 -> kept
    val got = run(rows, fracNum = 3, fracDen = 4)
    assert(got(1L) === (("promo\nbody 1", 2L, 0L)))
  }
}
