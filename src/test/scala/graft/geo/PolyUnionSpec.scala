package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class PolyUnionSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1)))

  /** L1-ball (45°-rotated square) of radius r at (cx, cy). */
  private def diamond(cx: Double, cy: Double, r: Double): Polygon =
    Polygon(Array(Array(cx - r, cy, cx, cy - r, cx + r, cy, cx, cy + r)))

  test("single diamond round-trips (area 2r², 4 vertices)") {
    val u = PolyUnion.union(Seq(diamond(0, 0, 3)))
    assert(u.area == 18.0)
    assert(u.nRings == 1 && u.nVertices == 4)
  }

  test("overlapping diamond chain: closed-form area, one ring") {
    // k diamonds radius 3 spaced 4 on the x-axis: adjacent overlap is a
    // diamond of half-diagonal (2r−d)/2 = 1 → area 2; union = k·18 − (k−1)·2
    val k = 5
    val u = PolyUnion.union((0 until k).map(i => diamond(i * 4.0, 0, 3)))
    assert(u.area == k * 18.0 - (k - 1) * 2.0)
    assert(u.nRings == 1)
    // tops + bottoms + 2 extremes + 2(k−1) pinch intersections
    assert(u.nVertices == 2 * k + 2 + 2 * (k - 1))
  }

  test("disjoint diamonds stay separate rings") {
    val u = PolyUnion.union(Seq(diamond(0, 0, 2), diamond(10, 0, 2)))
    assert(u.area == 16.0)
    assert(u.nRings == 2)
  }

  test("four-diamond ring encloses a hole (negative ring)") {
    // 8 diamonds r=3 around a square ring: adjacent centers are L1
    // distance 4 (< 2r → overlap) while the origin is L1 distance 4 from
    // every center (> r → uncovered) → the union encloses a hole
    val ds = Seq((0, 4), (4, 4), (4, 0), (4, -4), (0, -4), (-4, -4), (-4, 0), (-4, 4))
      .map { case (x, y) => diamond(x, y, 3) }
    val u = PolyUnion.union(ds)
    def shoelace(r: Array[Double]): Double = {
      val n = r.length / 2
      (0 until n).map { j =>
        val k = (j + 1) % n
        r(2 * j) * r(2 * k + 1) - r(2 * k) * r(2 * j + 1)
      }.sum * 0.5
    }
    val signs = u.rings.map(shoelace)
    assert(signs.count(_ > 0) == 1 && signs.count(_ < 0) == 1,
      s"expected outer + hole, got areas ${signs.mkString(",")}")
    // area agrees with a dense lattice coverage count (cell 0.05 → ±1%)
    val step = 0.05
    var covered = 0L
    var y = -8.0 + step / 2
    while (y < 8.0) {
      var x = -8.0 + step / 2
      while (x < 8.0) {
        if (ds.exists(_.contains(x, y))) covered += 1
        x += step
      }
      y += step
    }
    val sampled = covered * step * step
    assert(math.abs(u.area - sampled) < 0.02 * sampled,
      s"area ${u.area} vs sampled $sampled")
  }

  test("rectilinear inputs agree with RectUnion (random cross-validation)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val rects = (0 until 6).map { _ =>
        val x0 = rnd.nextInt(20).toDouble; val y0 = rnd.nextInt(20).toDouble
        rect(x0, y0, x0 + 1 + rnd.nextInt(8), y0 + 1 + rnd.nextInt(8))
      }
      val a = RectUnion.union(rects)
      val b = PolyUnion.union(rects)
      assert(math.abs(a.area - b.area) < 1e-9, s"area ${a.area} vs ${b.area} for $rects")
      assert(a.nRings == b.nRings, s"rings ${a.nRings} vs ${b.nRings} for $rects")
    }
  }

  test("shared-edge polygons merge without a seam") {
    val u = PolyUnion.union(Seq(
      Polygon(Array(Array(0.0, 0, 4, 0, 2, 3))),   // triangle
      Polygon(Array(Array(0.0, 0, 2, 3, 0, 6)))))  // triangle sharing edge (0,0)-(2,3)
    assert(u.nRings == 1)
    assert(math.abs(u.area - (6.0 + 6.0)) < 1e-9)
    // (2,3) is collinear with (4,0)→(0,6); the merged hull is a triangle
    assert(u.nVertices == 3)
  }
}
