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

  /** BigInt hotspot reference: (x, y) -> (v, nbr_n, nbr_sum, excess_ppm). */
  private def hotRef(cells: Seq[(Long, Long, Long)]): Map[(Long, Long), (Long, Long, BigInt, Long)] = {
    val m = cells.map { case (x, y, v) => (x, y) -> v }.toMap
    val n = BigInt(cells.size)
    val s = BigInt(cells.map(_._3).sum)
    m.map { case ((x, y), v) =>
      val nbr = Seq((0L, 0L), (1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L))
        .flatMap { case (dx, dy) => m.get((x + dx, y + dy)) }
      val g = nbr.map(BigInt(_)).sum
      val mi = BigInt(nbr.size)
      val exc = n * g - mi * s
      val ppm = (exc.signum * (exc.abs * 1000000 / (mi * s))).toLong
      (x, y) -> (v, mi.toLong, g, ppm)
    }
  }

  private def runHot(cells: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    SpatialStats.hotspots(cells.toDF("x", "y", "v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), BigInt(r.getLong(4)), r.getLong(5))).toMap
  }

  test("hotspots: a hot cell in a cold plain scores positive, the plain negative") {
    val cells = (for (x <- 0L until 5L; y <- 0L until 5L)
      yield (x, y, if (x == 2 && y == 2) 100L else 1L))
    val got = runHot(cells)
    assert(got == hotRef(cells))
    assert(got((2L, 2L))._4 > 1000000L, s"hot center should exceed double-average: $got")
    assert(got((0L, 0L))._4 < 0L, "cold corner should be below average")
    // the hot cell's rook neighbors inherit positive excess from the stencil
    assert(got((2L, 1L))._4 > 0L)
  }

  test("hotspots: random lattices match the BigInt reference exactly") {
    val rnd = new scala.util.Random(23)
    (1 to 4).foreach { _ =>
      val cells = (0 until 60).map(_ =>
        (rnd.nextInt(10).toLong, rnd.nextInt(10).toLong, (rnd.nextInt(500) + 1).toLong))
        .distinctBy(c => (c._1, c._2))
      assert(runHot(cells) == hotRef(cells))
    }
  }

  /** BigInt skew reference. */
  private def skewRef(cells: Seq[(Long, Long)]): (Long, Long, Long, Long, Long, Long) = {
    val n = cells.size.toLong
    val s = cells.map(_._2).sum
    val vMax = cells.map(_._2).max
    val topCell = cells.filter(_._2 == vMax).map(_._1).min
    val sorted = cells.sortBy(c => (c._2, c._1))
    val gnum = sorted.zipWithIndex.map { case ((_, v), i0) =>
      BigInt(2L * (i0 + 1) - n - 1) * v
    }.sum
    (n, s, vMax, topCell, vMax * 1000000L / s,
      (gnum * 1000000 / (BigInt(n) * s)).toLong)
  }

  private def runSkew(cells: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = SpatialStats.cellSkew(cells.toDF("cell", "v")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("cell skew: uniform loads have Gini 0; one hot cell dominates") {
    val uniform = (0L until 10L).map(c => (c, 7L))
    val u = runSkew(uniform)
    assert(u == skewRef(uniform))
    assert(u._6 == 0L)
    val hot = Seq((5L, 1L), (6L, 1L), (7L, 1L), (3L, 97L))
    val h = runSkew(hot)
    assert(h == skewRef(hot))
    assert(h == (4L, 100L, 97L, 3L, 970000L, 720000L))
  }

  test("cell skew: random loads match the BigInt reference exactly") {
    val rnd = new scala.util.Random(41)
    (1 to 4).foreach { _ =>
      val cells = (0 until 70).map(i => (i.toLong, (rnd.nextInt(1000) + 1).toLong))
      assert(runSkew(cells) == skewRef(cells))
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
