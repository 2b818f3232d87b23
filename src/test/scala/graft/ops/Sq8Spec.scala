package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: code range, per-element dequantization error
  * bound, zero-vector handling, a pure-Scala code reference, and the
  * integer-dot top-k against a collected-codes reference.
  */
class Sq8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sq8-spec").getOrCreate()

  private def vecsDf(vs: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  private val fixture: Seq[(Long, Seq[Float])] = (0L until 40L).map { i =>
    i -> (0 until 16).map(j =>
      (math.sin(i * 16 + j).toFloat * (1 + (i % 5)))).toSeq
  }

  test("codes match the pure-Scala reference and stay in [-127, 127]") {
    val got = Similarity.sq8Quantize(vecsDf(fixture))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Long](2)))).toMap
    for ((id, emb) <- fixture) {
      val maxabs = emb.map(x => math.abs(x.toDouble)).max
      val inv = 127.0 / maxabs
      val want = emb.map(x => math.floor(x.toDouble * inv + 0.5).toLong)
      val (scale, codes) = got(id)
      assert(scale === maxabs / 127.0)
      assert(codes === want)
      assert(codes.forall(c => c >= -127 && c <= 127))
    }
  }

  test("dequantization error is within scale/2 per element") {
    val got = Similarity.sq8Quantize(vecsDf(fixture))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Long](2)))).toMap
    for ((id, emb) <- fixture; (x, c) <- emb.zip(got(id)._2)) {
      val err = math.abs(x.toDouble - c * got(id)._1)
      assert(err <= got(id)._1 / 2 + 1e-12, s"vec $id: err $err")
    }
  }

  test("zero vectors quantize to zero codes with scale 0") {
    val got = Similarity.sq8Quantize(
        vecsDf(Seq(7L -> Seq.fill(16)(0.0f))))
      .collect()(0)
    assert(got.getDouble(1) === 0.0)
    assert(got.getSeq[Long](2).forall(_ === 0L))
  }

  test("annSq8 top-k equals the collected-codes reference") {
    val q = Similarity.sq8Quantize(vecsDf(fixture))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2)))
    val want = (for {
      (qa, sa, ca) <- q if qa < 5
    } yield {
      val scored = q.filter(_._1 != qa).map { case (nb, sb, cb) =>
        (nb, ca.zip(cb).map { case (x, y) => x * y }.sum.toDouble * sa * sb)
      }
      qa -> scored.sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSeq
    }).toMap
    val got = Similarity.annSq8(vecsDf(fixture), probeMaxId = 5, k = 3)
      .orderBy("query_id", "rank")
      .collect().groupBy(_.getLong(0))
      .map { case (k2, rs) => k2 -> rs.map(_.getLong(1)).toSeq }
    assert(got === want)
  }
}
