package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kNN classifier eval: in-JVM brute-force differential on a planted
  * fixture (including a case where the 5-vote majority disagrees with
  * the single nearest neighbor), and parallelism bit-stability.
  */
class KnnEvalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("KnnEvalSpec").getOrCreate()

  /** 3 well-separated clusters at (10,0..), (0,10,..), (0,0,10,...)
    * with one mislabeled train point per cluster so votes matter.
    * Test ids are multiples of 10.
    */
  private def fixture = {
    import spark.implicits._
    val dims = 8
    def vec(axis: Int, jit: Float): Array[Float] = {
      val a = Array.fill(dims)(0f); a(axis) = 10f + jit; a(axis + 3) = jit; a
    }
    val rows = (0 until 90).map { i =>
      val cluster = i % 3
      val jit = (i % 7) * 0.01f
      // train ids 21/42/63 are three of test 0's five nearest (distance 0
      // at jit 0); mislabeling exactly them forces a 3-2 wrong majority
      // for test 0 while 1-NN alone would also be wrong — and every other
      // test point stays correct
      val label = if (i == 21 || i == 42 || i == 63) (cluster + 1) % 3 else cluster
      (i.toLong, vec(cluster, jit), label)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("majority vote matches in-JVM brute force on the planted fixture") {
    val df = fixture
    val all = df.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(x => math.round(x * 1000.0)).toArray,
        r.getInt(2))
    }
    val train = all.filter(_._1 % 10 != 0)
    val expected = all.filter(_._1 % 10 == 0).map { case (id, q, lt) =>
      val nearest = train
        .map { case (nid, nq, nl) =>
          val d = q.zip(nq).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, nid, nl)
        }
        .sortBy { case (d, nid, _) => (d, nid) }.take(5)
      val votes = nearest.groupBy(_._3).map { case (l, g) => (l, g.size) }
      val (pred, v) = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head
      (id, lt, pred, v.toLong, pred == lt)
    }.toSet
    val got = Similarity.knnClassifyEval(df, k = 5, testMod = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.exists(!_._5), "fixture must include a miss")
    assert(got.count(_._5) > got.size / 2, "and mostly hits")
  }

  test("nearest-centroid matches an in-JVM exact-rational brute force") {
    val df = fixture
    val all = df.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(x => math.round(x * 1000.0)).toArray,
        r.getInt(2))
    }
    val train = all.filter(_._1 % 10 != 0)
    val cents = train.groupBy(_._3).map { case (l, g) =>
      val n = g.size.toLong
      val s = g.map(_._2).transpose.map(_.sum)
      (l, s.toArray, n)
    }.toSeq
    val expected = all.filter(_._1 % 10 == 0).map { case (id, p, lt) =>
      val scored = cents.map { case (l, s, n) =>
        val d2n2 = p.zip(s).map { case (v, sv) => (n * v - sv) * (n * v - sv) }.sum
        (l, BigInt(d2n2), BigInt(n * n))
      }
      // exact rational argmin, ties to lower label
      val win = scored.reduceLeft { (a, b) =>
        val cmp = a._2 * b._3 compare b._2 * a._3
        if (cmp < 0 || (cmp == 0 && a._1 < b._1)) a else b
      }
      (id, lt, win._1)
    }.toSet
    val got = Similarity.centroidClassifyEval(df, 10)
      .select("vec_id", "label_true", "label_pred")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("predictions are bit-stable across parallelism") {
    val df = fixture
    val ref = Similarity.knnClassifyEval(df.repartition(1), 5, 10)
      .collect().map(_.toSeq).toSet
    for (p <- Seq(3, 16)) {
      val got = Similarity.knnClassifyEval(df.repartition(p), 5, 10)
        .collect().map(_.toSeq).toSet
      assert(got == ref, s"parts=$p")
    }
  }
}
