package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Sutherland–Hodgman clip + shoelace coverage vs closed forms and a
  * Monte-Carlo-free grid reference on non-rectilinear shapes.
  */
class ClipAreaSpec extends AnyFunSuite {

  private def poly(pts: (Double, Double)*): Polygon =
    Polygon(Array(pts.flatMap(p => Seq(p._1, p._2)).toArray))

  test("rect ∩ cell closed forms, including fully-inside and disjoint") {
    val r = poly((1.25, 0.5), (3.75, 0.5), (3.75, 2.25), (1.25, 2.25))
    assert(ClipArea.intersectionArea(r, 2, 1, 3, 2) === 1.0)            // inside
    assert(ClipArea.intersectionArea(r, 1, 0, 2, 1) === 0.75 * 0.5)     // corner
    assert(ClipArea.intersectionArea(r, 5, 5, 6, 6) === 0.0)            // disjoint
    assert(ClipArea.intersectionArea(r, 3, 2, 4, 3) === 0.75 * 0.25)    // corner
  }

  test("triangle coverage sums to the triangle area over the whole grid") {
    val t = poly((0.3, 0.1), (4.6, 0.9), (1.9, 3.7))
    val want = math.abs(ClipArea.shoelace(
      Array(0.3, 0.1, 4.6, 0.9, 1.9, 3.7)))
    var got = 0.0
    for (cx <- -1 to 5; cy <- -1 to 4)
      got += ClipArea.intersectionArea(t, cx, cy, cx + 1, cy + 1)
    assert(math.abs(got - want) < 1e-12, s"partition of unity: $got vs $want")
  }

  test("holes subtract: donut cell coverage") {
    val donut = Polygon(Array(
      Array(0, 0, 4, 0, 4, 4, 0, 4),
      Array(1, 1, 3, 1, 3, 3, 1, 3)))
    // center cell (1..3)x(1..3) quadrant (1,1)-(2,2) is all hole
    assert(ClipArea.intersectionArea(donut, 1, 1, 2, 2) === 0.0)
    // edge cell half-covered by shell, no hole
    assert(ClipArea.intersectionArea(donut, 0, 0, 1, 1) === 1.0)
    var got = 0.0
    for (cx <- 0 to 3; cy <- 0 to 3)
      got += ClipArea.intersectionArea(donut, cx, cy, cx + 1, cy + 1)
    assert(math.abs(got - 12.0) < 1e-12) // 16 shell - 4 hole
  }

  test("closed-ring encoding (repeated last vertex) is accepted") {
    val closed = Polygon(Array(Array(0, 0, 2, 0, 2, 2, 0, 2, 0, 0)))
    assert(ClipArea.intersectionArea(closed, 0, 0, 2, 2) === 4.0)
  }

  test("canonicalRing: rotation + orientation to CCW-from-min-vertex") {
    // same square entered in 4 rotations × both orientations all map to
    // the single canonical form
    val want = Array[Double](1, 1, 3, 1, 3, 3, 1, 3)
    val base = Array[Double](1, 1, 3, 1, 3, 3, 1, 3)
    for (rot <- 0 until 4) {
      val rotated = Array.tabulate(8) { i =>
        base((2 * rot + i) % 8)
      }
      assert(ClipArea.canonicalRing(rotated, ccw = true).toSeq === want.toSeq,
        s"rot $rot")
      val rev = rotated.grouped(2).toSeq.reverse.flatten.toArray
      assert(ClipArea.canonicalRing(rev, ccw = true).toSeq === want.toSeq,
        s"rot $rot reversed")
    }
    // hole convention: CW
    val cw = ClipArea.canonicalRing(base, ccw = false)
    assert(ClipArea.shoelace(cw) < 0 && cw(0) == 1.0 && cw(1) == 1.0)
  }

  test("clipRing: edge-touch collapses to empty; boundary dups removed") {
    // square touching the clip window only along x=2
    val r = Array[Double](2, 0, 4, 0, 4, 2, 2, 2)
    assert(ClipArea.clipRing(r, 0, 0, 2, 2).isEmpty)
    // square with a vertex ON the clip edge: no consecutive duplicates
    val s = Array[Double](1, 1, 3, 1, 3, 3, 1, 3)
    val c = ClipArea.clipRing(s, 1, 1, 2, 2)
    val pts = c.grouped(2).map(a => (a(0), a(1))).toSeq
    assert(pts.distinct.length === pts.length, s"dup vertices in $pts")
    assert(math.abs(ClipArea.shoelace(ClipArea.canonicalRing(c, ccw = true))) === 1.0)
  }
}
