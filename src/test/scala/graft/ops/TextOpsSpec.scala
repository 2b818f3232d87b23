package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** C4-style corpus-wide segment dedup and the Gopher quality rules: the
  * oracle queries check engine-vs-DuckDB parity on the synthetic corpus;
  * this spec pins the SEMANTICS on handcrafted fixtures — first
  * occurrence in (doc_id, pos) order wins globally, losers are removed,
  * surviving segments keep their original order.
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("segmentDedup keeps exactly the first occurrence corpus-wide") {
    val df = docs(
      0L -> "alpha beta gamma",
      1L -> "beta delta alpha delta",
      2L -> "gamma gamma epsilon")
    val out = TextOps.segmentDedup(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 0 owns alpha/beta/gamma (first in doc order)
    assert(out(0L) == ((3L, 3L, "alpha beta gamma")))
    // doc 1: beta+alpha lost to doc 0; first delta survives, second is an
    // intra-corpus duplicate of it
    assert(out(1L) == ((4L, 1L, "delta")))
    // doc 2: gamma lost to doc 0 (both copies), epsilon survives
    assert(out(2L) == ((3L, 1L, "epsilon")))
  }

  test("segmentDedup: duplicate-free corpus is the identity") {
    val df = docs(0L -> "a b c", 1L -> "d e f")
    val out = TextOps.segmentDedup(df).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(0L -> "a b c", 1L -> "d e f"))
  }

  test("segmentDedup: fully duplicated doc comes back empty, not dropped") {
    val df = docs(0L -> "x y", 5L -> "y x")
    val out = TextOps.segmentDedup(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((2L, "x y")))
    assert(out(5L) == ((0L, "")))
  }

  test("segmentDedup is deterministic across parallelism levels") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, s"tok${i % 7} tok${i % 13} tok${i % 3} filler$i"))
    val a = TextOps.segmentDedup(rows.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.segmentDedup(rows.toDF("doc_id", "text").repartition(16))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("gopherRules metrics and composite on a handcrafted doc") {
    val good = (1 to 10).map(i => s"the token$i words of text").mkString(" ")
    val df = docs(0L -> good, 1L -> "a b", 2L -> "the quick brown fox 123 456 789 000")
    val out = TextOps.gopherRules(df, minTokens = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(5)))).toMap
    val (nTok, meanLen, nStop, passes) = out(0L)
    assert(nTok == 50L)
    assert(nStop == 20L) // 'the' + 'of' per repeat
    assert(math.abs(meanLen - (good.replace(" ", "").length / 50.0)) < 1e-12)
    assert(passes)
    assert(!out(1L)._4)            // too short
    assert(out(2L)._3 == 1L)       // only one stopword -> fails the >=2 rule
    assert(!out(2L)._4)
  }
}
