package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MoranSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** BigInt reference: (n, s, w, num2, den, ppm). */
  private def ref(cells: Seq[(Long, Long, Long)]): (Long, Long, Long, BigInt, BigInt, Long) = {
    val n = BigInt(cells.size)
    val s = BigInt(cells.map(_._3).sum)
    val dev = cells.map { case (x, y, v) => (x, y) -> (n * v - s) }.toMap
    val pairsU = for {
      ((x, y), d) <- dev.toSeq
      (dx, dy) <- Seq((1L, 0L), (0L, 1L))
      d2 <- dev.get((x + dx, y + dy))
    } yield d * d2
    val num2 = pairsU.sum * 2
    val den = dev.values.map(d => d * d).sum
    val w = pairsU.size.toLong * 2
    val ppm = if (w == 0 || den == 0) 0L
      else (num2.signum * ((num2.abs * n * 1000000) / (BigInt(w) * den))).toLong
    (n.toLong, s.toLong, w, num2, den, ppm)
  }

  private def run(cells: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val r = SpatialStats.moranI(cells.toDF("x", "y", "v")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), BigInt(r.getLong(3)),
      BigInt(r.getLong(4)), r.getLong(5))
  }

  test("checkerboard lattice is strongly negatively autocorrelated") {
    val cells = for (x <- 0L until 6L; y <- 0L until 6L)
      yield (x, y, if ((x + y) % 2 == 0) 10L else 1L)
    val got = run(cells)
    assert(got == ref(cells))
    assert(got._6 < -900000L, s"checkerboard should push I toward -1: $got")
  }

  test("smooth gradient is positively autocorrelated") {
    val cells = for (x <- 0L until 6L; y <- 0L until 6L) yield (x, y, x + y)
    val got = run(cells)
    assert(got == ref(cells))
    assert(got._6 > 500000L, s"gradient should push I positive: $got")
  }

  test("random lattices match the BigInt reference exactly") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val cells = (0 until 80).map(_ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
        .distinctBy(c => (c._1, c._2))
      assert(run(cells) == ref(cells))
    }
  }

  test("degenerate frames: no adjacency and constant value give ppm 0") {
    // isolated cells (no rook neighbors)
    val iso = Seq((0L, 0L, 5L), (10L, 10L, 9L), (20L, 0L, 1L))
    val a = run(iso)
    assert(a._3 == 0L && a._6 == 0L)
    assert(a == ref(iso))
    // constant value: den = 0
    val const = for (x <- 0L until 3L; y <- 0L until 3L) yield (x, y, 7L)
    val b = run(const)
    assert(b._5 == 0 && b._6 == 0L)
    assert(b == ref(const))
  }
}
