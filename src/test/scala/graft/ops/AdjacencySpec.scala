package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BV-style adjacency compression: the real byte codec round-trips, its
  * encoded lengths equal the accounting query's arithmetic row for row,
  * and the negative-first-successor (zigzag) branch is live.
  */
class AdjacencySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("AdjacencySpec").getOrCreate()

  private def edges = {
    import spark.implicits._
    // src 5: successors below AND above src (zigzag both signs);
    // src 1000: gaps crossing the 1- and 2-byte varint boundaries;
    // src 7: duplicate edges (dedup must make them count once)
    val rows = Seq(
      (5L, 2L), (5L, 9L), (5L, 10L), (5L, 300L),
      (1000L, 0L), (1000L, 127L), (1000L, 128L), (1000L, 20000L),
      (7L, 7L), (7L, 7L), (7L, 8L))
    rows.toDF("src", "dst")
  }

  test("byte codec round-trips sorted-distinct successor lists") {
    val lists = Seq(
      (5L, Seq(2L, 9L, 10L, 300L)),
      (1000L, Seq(0L, 127L, 128L, 20000L)),
      (7L, Seq(7L, 8L)),
      (0L, Seq(123456789L)),
      (50L, Seq(3L))) // first successor below src
    for ((src, dsts) <- lists) {
      val b = WebOps.adjacencyEncode(src, dsts)
      assert(WebOps.adjacencyDecode(src, dsts.length, b) == dsts, s"src=$src")
    }
  }

  test("accounting query equals the real codec's byte counts row for row") {
    val acc = WebOps.adjacencyCompress(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byKey = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq).toMap
    assert(acc.keySet == byKey.keySet)
    for ((src, dsts) <- byKey) {
      val bytes = WebOps.adjacencyEncode(src, dsts)
      assert(acc(src) == ((dsts.length.toLong, bytes.length.toLong)), s"src=$src")
    }
  }

  test("ratio reflects real compression on a dense near-sequential list") {
    import spark.implicits._
    val dense = (0 until 1000).map(i => (42L, 100000L + i * 2)).toDF("src", "dst")
    val row = WebOps.adjacencyCompress(dense).head()
    assert(row.getLong(1) == 1000)
    // first successor costs 3 varint bytes (zigzag ~200k), gaps 1 byte each
    assert(row.getLong(2) == 3 + 999)
    assert(row.getLong(4) < 200000, s"ratio_ppm ${row.getLong(4)}")
  }

  test("decoder rejects truncated and trailing bytes") {
    val b = WebOps.adjacencyEncode(5L, Seq(2L, 9L, 300L))
    intercept[IllegalArgumentException] {
      WebOps.adjacencyDecode(5L, 3, b.take(b.length - 1))
    }
    intercept[IllegalArgumentException] {
      WebOps.adjacencyDecode(5L, 3, b :+ 0.toByte)
    }
  }
}
