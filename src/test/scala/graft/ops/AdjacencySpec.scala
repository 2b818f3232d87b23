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

  test("rice codec round-trips and its bit count matches the accounting") {
    val values = Seq(0L, 1L, 5L, 127L, 128L, 1000L, 7L)
    for (k <- Seq(0, 1, 3, 7)) {
      val enc = WebOps.riceEncode(values, k)
      assert(WebOps.riceDecode(enc, k, values.length) == values, s"k=$k")
      val bits = values.map(v => (v >>> k) + 1 + k).sum
      assert(enc.length == ((bits + 7) / 8), s"k=$k")
    }
  }

  test("adjacencyRice accounting equals the real bit codec per source") {
    val acc = WebOps.adjacencyRice(edges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    val byKey = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq).toMap
    for ((src, dsts) <- byKey) {
      // rebuild the gap stream exactly as the query defines it
      val encs = dsts.zipWithIndex.map { case (d, i) =>
        if (i == 0) { val x = d - src; if (x >= 0) x * 2 else -x * 2 - 1 }
        else d - dsts(i - 1)
      }
      val mean = math.max(1L, encs.sum / encs.length)
      val k = 63 - java.lang.Long.numberOfLeadingZeros(mean)
      val bytes = WebOps.riceEncode(encs, k)
      val (deg, gotK, bits, rbytes) = acc(src)
      assert(deg == dsts.length && gotK == k, s"src=$src")
      assert(bits == encs.map(v => (v >>> k) + 1 + k).sum, s"src=$src")
      assert(rbytes == bytes.length, s"src=$src")
      assert(WebOps.riceDecode(bytes, k, encs.length) == encs, s"src=$src")
    }
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
