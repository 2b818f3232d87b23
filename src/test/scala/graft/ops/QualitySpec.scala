package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact-certificate checks on a hand-planted dirty frame: every num/den
  * is asserted against hand counts, both verdict paths fire, and the
  * empty-input coalesce path yields a passing 0/0 rather than null.
  */
class QualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("quality-spec").getOrCreate()

  import org.apache.spark.sql.Row

  private def dirty = {
    import spark.implicits._
    // (id, fk, status, price): one null fk, duplicate id 2, status 'X'
    // outside the set, one orphan fk 99, one negative price
    Seq[(java.lang.Long, java.lang.Long, String, java.lang.Double)](
      (1L, 10L, "A", 5.0), (2L, 11L, "B", 6.0), (2L, 10L, "A", 7.0),
      (3L, null, "X", -1.0), (4L, 99L, "B", 8.0))
      .toDF("id", "fk", "status", "price")
  }
  private def parents = {
    import spark.implicits._
    Seq(10L, 11L, 12L).toDF("pk")
  }

  private def row(df: org.apache.spark.sql.DataFrame): (Long, Long, Boolean) = {
    val r: Row = df.head
    (r.getLong(1), r.getLong(2), r.getBoolean(3))
  }

  test("profile counts nulls and distincts exactly") {
    val p = Quality.profile(dirty, Seq("id", "fk")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(p("id") === ((5L, 5L, 0L, 4L, 1000000L)))
    assert(p("fk") === ((5L, 4L, 1L, 3L, 800000L)))
  }

  test("uniqueness, containment, membership, range verdicts") {
    assert(row(Quality.uniquenessCheck(dirty, "id")) === ((4L, 5L, false)))
    assert(row(Quality.uniquenessCheck(dirty, "status")) === ((3L, 5L, false)))
    // containment: fks 10,11,10,99 -> 3 of 4 contained
    assert(row(Quality.containmentCheck(dirty, "fk", parents, "pk")) ===
      ((3L, 4L, false)))
    assert(row(Quality.membershipCheck(dirty, "status", Seq("A", "B"))) ===
      ((4L, 5L, false)))
    assert(row(Quality.membershipCheck(dirty, "status", Seq("A", "B", "X"))) ===
      ((5L, 5L, true)))
    // price q4 range [0, 80000]: the -1.0 row fails
    assert(row(Quality.rangeCheck(dirty, "price", 0L, 80000L)) ===
      ((4L, 5L, false)))
    assert(row(Quality.rangeCheck(dirty, "price", -10000L, 80000L)) ===
      ((5L, 5L, true)))
  }

  test("completeness threshold cross-multiplication") {
    assert(row(Quality.completenessCheck(dirty, "fk")) === ((4L, 5L, false)))
    // 4/5 = 0.8 -> passes at minPpm 800000, fails at 800001
    assert(row(Quality.completenessCheck(dirty, "fk", 800000L))._3)
    assert(!row(Quality.completenessCheck(dirty, "fk", 800001L))._3)
  }

  test("empty input: coalesced 0/0 passes instead of null") {
    val empty = dirty.filter("id > 100")
    assert(row(Quality.membershipCheck(empty, "status", Seq("A"))) ===
      ((0L, 0L, true)))
    assert(row(Quality.rangeCheck(empty, "price", 0L, 1L)) === ((0L, 0L, true)))
  }
}
