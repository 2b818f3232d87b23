package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Stump training vs a BigInt brute-force reference (same bin rule, all
  * candidate splits scored as exact rationals), a perfectly-separable
  * planted feature, the lexicographic tie contract, and partitioning
  * determinism.
  */
class TreesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("trees-spec").getOrCreate()

  /** Brute force over the same binning: returns the winning
    * (feature, bin) under the exact a/b maximization + lex tie rule. */
  private def ref(rows: Seq[(Long, Map[String, Long])], feats: Seq[String],
                  bins: Int): (String, Int) = {
    def binOf(v: Long, lo: Long, hi: Long): Int =
      ((v - lo) * bins / (hi - lo + 1)).toInt
    val cands = for {
      f <- feats
      vals = rows.map(_._2(f))
      lo = vals.min; hi = vals.max
      binned = rows.map { case (l, m) => (l, binOf(m(f), lo, hi)) }
      b <- binned.map(_._2).distinct.sorted
      left = binned.filter(_._2 <= b); right = binned.filter(_._2 > b)
      if left.nonEmpty && right.nonEmpty
    } yield {
      def sq(xs: Seq[(Long, Int)]): BigInt = {
        val c0 = BigInt(xs.count(_._1 == 0L)); val c1 = BigInt(xs.count(_._1 != 0L))
        c0 * c0 + c1 * c1
      }
      val nl = BigInt(left.size); val nr = BigInt(right.size)
      ((f, b), sq(left) * nr + sq(right) * nl, nl * nr)
    }
    cands.reduceLeft { (x, y) =>
      val cmp = (y._2 * x._3).compare(x._2 * y._3)
      if (cmp > 0 || (cmp == 0 && (y._1._1 < x._1._1 ||
        (y._1._1 == x._1._1 && y._1._2 < x._1._2)))) y else x
    }._1
  }

  private def train(rows: Seq[(Long, Long, Long)], bins: Int,
                    parts: Int = 4): (String, Int) = {
    import spark.implicits._
    val df = rows.toDF("label", "fa", "fb").repartition(parts)
    val r = Trees.stump(df, "label", Seq("fa", "fb"), bins).head
    (r.getString(0), r.getInt(1))
  }

  test("matches the BigInt brute force on a noisy two-feature set") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val label = if (i % 3 == 0) 1L else 0L
      // fa correlates with the label, fb is noise
      (label, label * 40 + rng.nextInt(60).toLong, rng.nextInt(100).toLong)
    }
    val want = ref(rows.map { case (l, a, b) =>
      (l, Map("fa" -> a, "fb" -> b)) }, Seq("fa", "fb"), 16)
    assert(train(rows, 16) === want)
  }

  test("perfectly separable feature wins with zero left/right impurity") {
    import spark.implicits._
    val rows = (0 until 100).map(i =>
      (if (i < 40) 1L else 0L, if (i < 40) 5L else 90L, (i % 7).toLong))
    val r = Trees.stump(rows.toDF("label", "fa", "fb"), "label",
      Seq("fa", "fb"), 16).head
    assert(r.getString(0) === "fa")
    // pure sides: c1l = nl and c0r = nr (all positives left)
    assert(r.getLong(5) === r.getLong(2) && r.getLong(6) === r.getLong(3))
  }

  test("tie breaks to the lexicographically smaller feature/bin") {
    // fb mirrors fa exactly -> identical scores; 'fa' < 'fb' must win
    val rows = (0 until 60).map(i =>
      (if (i % 2 == 0) 1L else 0L, (i % 10).toLong, (i % 10).toLong))
    assert(train(rows.map(r => (r._1, r._2, r._3)), 8)._1 === "fa")
  }

  test("partitioning-independent") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (rng.nextInt(2).toLong, rng.nextInt(50).toLong, rng.nextInt(50).toLong)
    }
    assert(train(rows, 16, parts = 1) === train(rows, 16, parts = 13))
  }
}
