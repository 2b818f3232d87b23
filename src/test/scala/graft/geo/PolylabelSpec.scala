package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Polylabel invariants: known closed forms (square, rectangle), the
  * inside/clearance contract, and grid-certified optimality — no interior
  * grid point may beat the returned pole by more than the precision.
  */
class PolylabelSpec extends AnyFunSuite {

  private def poly(pts: (Double, Double)*): Polygon =
    Polygon(Array(pts.flatMap(p => Seq(p._1, p._2)).toArray))

  test("square: pole is the center, clearance half the side") {
    val (x, y, d) = Polylabel.pole(poly((0, 0), (10, 0), (10, 10), (0, 10)), 1e-7)
    assert(math.abs(x - 5) < 1e-6 && math.abs(y - 5) < 1e-6 && math.abs(d - 5) < 1e-6)
  }

  test("wide rectangle: clearance is half the SHORT side, x free along the spine") {
    // a flat medial RIDGE: near-optimal cells line the whole spine, so
    // precision must sit at the feature scale (see pole() scaladoc)
    val (_, y, d) = Polylabel.pole(poly((0, 0), (30, 0), (30, 10), (0, 10)), 1e-3)
    assert(math.abs(y - 5) < 1e-2 && math.abs(d - 5) < 1e-2)
  }

  test("flat-ridge + absurd precision fails loudly, not with OOM") {
    val e = intercept[IllegalArgumentException] {
      Polylabel.pole(poly((0, 0), (30, 0), (30, 10), (0, 10)), 1e-12,
        maxCells = 100000)
    }
    assert(e.getMessage.contains("flat-ridge"))
  }

  test("hole pushes the pole off the centroid") {
    val p = Polygon(Array(
      Array(0, 0, 20, 0, 20, 10, 0, 10),
      Array(2, 2, 6, 2, 6, 6, 2, 6))) // hole in the left half
    val (x, y, d) = Polylabel.pole(p, 1e-3)
    assert(p.contains(x, y))
    assert(x > 10, s"pole ($x,$y) should move right of the hole")
    assert(math.abs(d - Polylabel.signedDist(p, x, y)) < 1e-12)
  }

  test("grid-certified optimality on an L-shape with a hole") {
    val p = Polygon(Array(
      Array(0, 0, 10, 0, 10, 4, 4, 4, 4, 12, 0, 12),
      Array(1, 6, 2, 6, 2, 8, 1, 8)))
    val (x, y, d) = Polylabel.pole(p, 1e-7)
    assert(p.contains(x, y))
    var bestGrid = -1.0
    for (gx <- 0 to 200; gy <- 0 to 240) {
      val px = gx * 0.05; val py = gy * 0.05
      if (p.contains(px, py)) {
        val gd = Polylabel.signedDist(p, px, py)
        if (gd > bestGrid) bestGrid = gd
      }
    }
    // the 0.05-grid optimum can beat the pole by at most grid-diag/√2·…;
    // conservatively allow the grid spacing itself
    assert(d >= bestGrid - 0.05, s"pole d=$d but grid found $bestGrid")
  }

  test("determinism: repeated runs return bit-identical answers") {
    val p = Polygon(Array(Array(0, 0, 30, 1, 2, 5)))
    val a = Polylabel.pole(p, 1e-9)
    val b = Polylabel.pole(p, 1e-9)
    assert(a === b)
    assert(p.contains(a._1, a._2))
  }
}
