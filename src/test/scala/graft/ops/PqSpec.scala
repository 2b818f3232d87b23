package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: encode/ADC exactness on codeword-aligned input,
  * training distortion monotonicity, parallelism determinism, and recall
  * on planted clusters.
  */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pq-spec").getOrCreate()

  private def embDf(vs: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    vs.toDF("vec_id", "embedding")
  }

  test("ADC is exact when every subvector sits on a codeword") {
    // dim 8, m=2: subvectors drawn from 3 codewords per subspace
    val cw0 = Seq(Seq(1f, 0f, 0f, 2f), Seq(0f, 1f, 1f, 0f), Seq(2f, 2f, 0f, 1f))
    val cw1 = Seq(Seq(0f, 0f, 1f, 1f), Seq(1f, 2f, 0f, 0f), Seq(2f, 0f, 2f, 2f))
    val rnd = new scala.util.Random(5)
    val vs = (0L until 30L).map { id =>
      (id, cw0(rnd.nextInt(3)) ++ cw1(rnd.nextInt(3)))
    }
    val books = Array(
      cw0.map(_.map(x => x.toDouble * 1000.0).toArray).toArray,
      cw1.map(_.map(x => x.toDouble * 1000.0).toArray).toArray)
    val got = Similarity.pqTopK(embDf(vs), probeMaxId = 5, k = 3, books)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force exact quantized dots
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.round(x * 1000.0).toDouble * math.round(y * 1000.0)
      }.sum
    val want = (0L until 5L).flatMap { pid =>
      val pv = vs.find(_._1 == pid).get._2
      vs.filter(_._1 != pid)
        .map { case (id, v) => (pid, id, dot(pv, v)) }
        .sortBy { case (_, id, s) => (-s, id) }
        .take(3)
    }
    assert(got.toSeq == want)
  }

  test("training: distortion non-increasing, deterministic across parallelism") {
    val rnd = new scala.util.Random(99)
    val vs = (0L until 120L).map { id =>
      (id, Seq.fill(8)((rnd.nextInt(9) - 4).toFloat))
    }
    def distortion(books: Array[Array[Array[Double]]]): Double = {
      val m = books.length
      vs.map { case (_, v) =>
        val q = v.map(x => math.round(x * 1000.0).toDouble)
        (0 until m).map { s =>
          val dsub = q.length / m
          val sub = q.slice(s * dsub, (s + 1) * dsub).toArray
          books(s).map(cw =>
            cw.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum
    }
    val d1 = distortion(Similarity.pqCodebooks(embDf(vs), m = 2, ksub = 4, iters = 1))
    val d3 = distortion(Similarity.pqCodebooks(embDf(vs), m = 2, ksub = 4, iters = 3))
    assert(d3 <= d1)
    val b4 = Similarity.pqCodebooks(embDf(vs), m = 2, ksub = 4, iters = 3)
    val b1 = Similarity.pqCodebooks(embDf(vs).repartition(1), m = 2, ksub = 4, iters = 3)
    assert(b4.map(_.map(_.toSeq).toSeq).toSeq == b1.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("recall: planted tight clusters are retrieved by trained PQ") {
    val rnd = new scala.util.Random(7)
    // 10 well-separated centers, 8 members each with tiny jitter
    val centers = Seq.fill(10)(Seq.fill(8)((rnd.nextInt(21) - 10).toFloat * 10f))
    val vs = (0 until 80).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val books = Similarity.pqCodebooks(embDf(vs), m = 2, ksub = 16, iters = 4)
    val top = Similarity.pqTopK(embDf(vs), probeMaxId = 10, k = 3, books)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every retrieved neighbor of probe p should be from p's cluster
    val good = top.count { case (p, n) => p % 10 == n % 10 }
    assert(good >= (top.length * 0.9).toInt,
      s"cluster recall too low: $good/${top.length}")
  }
}
