package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Wilson gate: the integer certificate cross-checked against a
  * double-precision Wilson lower bound over the full (n, k) grid to
  * n = 60 (skipping knife-edge cases within 1e-9 of the threshold, where
  * the float reference itself is unreliable — the integer form is the
  * ground truth there), plus the small-sample anchors.
  */
class WilsonSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("wilson-spec").getOrCreate()

  private def wilsonLb(k: Long, n: Long, z: Double): Double = {
    val p = k.toDouble / n
    val z2 = z * z
    (p + z2 / (2 * n) - z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) /
      (1 + z2 / n)
  }

  private def gate(rows: Seq[(String, Boolean)]): Map[String, (Long, Long, Boolean)] = {
    import spark.implicits._
    WebOps.hostQualityGate(rows.toDF("host", "good"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("small-sample anchors: 5/5 passes tau=1/2, 4/5 fails, 95/100 passes") {
    val rows =
      (1 to 5).map(_ => ("all5", true)) ++
      (1 to 4).map(_ => ("four5", true)) ++ Seq(("four5", false)) ++
      (1 to 95).map(_ => ("big", true)) ++ (1 to 5).map(_ => ("big", false))
    val got = gate(rows)
    assert(got("all5") === ((5L, 5L, true)))
    assert(got("four5") === ((5L, 4L, false)))
    assert(got("big") === ((100L, 95L, true)))
  }

  test("zero-good and all-good degenerate rows") {
    val got = gate(Seq(("z", false), ("z", false), ("one", true)))
    assert(got("z") === ((2L, 0L, false)))
    // n=1, k=1: lb = 0.2065... < 0.5 -> a single good page can't pass
    assert(got("one") === ((1L, 1L, false)))
  }

  test("integer certificate agrees with the float Wilson bound on a grid") {
    val cases = for {
      n <- 1 to 60
      k <- 0 to n
      lb = wilsonLb(k, n, 1.96)
      if math.abs(lb - 0.5) > 1e-9
    } yield (s"h${n}_$k", n, k, lb >= 0.5)
    val rows = cases.flatMap { case (h, n, k, _) =>
      (1 to k).map(_ => (h, true)) ++ (1 to (n - k)).map(_ => (h, false))
    }
    val got = gate(rows)
    for ((h, n, k, want) <- cases) {
      assert(got(h) === ((n.toLong, k.toLong, want)),
        s"n=$n k=$k lb=${wilsonLb(k, n, 1.96)}")
    }
  }
}
