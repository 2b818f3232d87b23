package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact counting quantiles: definition checks against the sorted-array
  * reference (p_q = sorted[⌈q·n/100⌉ − 1]), boundary cases (q=100, n=1,
  * all-equal), per-group isolation, and a differential over skewed
  * deterministic distributions.
  */
class QuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("quantile-spec").getOrCreate()

  private def run(rows: Seq[(String, String)], qs: Seq[Int])
      : Map[String, Seq[Long]] = {
    import spark.implicits._
    TextOps.lengthQuantiles(rows.toDF("lang", "text"), "lang", qs)
      .collect()
      .map(r => r.getString(0) ->
        (1 until r.length).map(i => r.getLong(i)).toSeq)
      .toMap
  }

  /** sorted[⌈q·n/100⌉ − 1] reference. */
  private def ref(lens: Seq[Int], q: Int): Long = {
    val s = lens.sorted
    val rank = (q * s.size + 99) / 100 // ceil(q*n/100)
    s(rank - 1).toLong
  }

  private def textOf(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("quantiles equal the sorted-array reference on a skewed corpus") {
    val lens = (1 to 100).map(i => (i * i) % 37 + 1)
    val rows = lens.map(n => ("en", textOf(n)))
    val got = run(rows, Seq(50, 90, 99))
    val Seq(nDocs, minT, p50, p90, p99, maxT) = got("en")
    assert(nDocs === 100L)
    assert(minT === lens.min.toLong && maxT === lens.max.toLong)
    assert(p50 === ref(lens, 50))
    assert(p90 === ref(lens, 90))
    assert(p99 === ref(lens, 99))
  }

  test("p100 is the max; a single doc answers every percentile") {
    val rows = Seq(("en", textOf(3)), ("en", textOf(9)), ("de", textOf(5)))
    val got = run(rows, Seq(1, 50, 100))
    assert(got("en") === Seq(2L, 3L, 3L, 3L, 9L, 9L))
    assert(got("de") === Seq(1L, 5L, 5L, 5L, 5L, 5L))
  }

  test("even count: lower median (rank ceil(n/2)) is chosen") {
    // lengths 1,2,3,4 -> p50 rank = ceil(200/100) = 2 -> value 2
    val rows = (1 to 4).map(n => ("en", textOf(n)))
    assert(run(rows, Seq(50))("en")(2) === 2L)
  }

  test("groups are independent") {
    val rows = (1 to 10).map(n => ("a", textOf(n))) ++
      (91 to 100).map(n => ("b", textOf(n)))
    val got = run(rows, Seq(50))
    assert(got("a")(2) === 5L)
    assert(got("b")(2) === 95L)
  }

  test("all-equal lengths collapse every percentile to that length") {
    val rows = (1 to 7).map(_ => ("x", textOf(12)))
    assert(run(rows, Seq(1, 50, 99))("x") === Seq(7L, 12L, 12L, 12L, 12L, 12L))
  }
}
