package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class RectUnionSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon.box(BBox(x0, x1, y0, y1))

  test("two overlapping rects: one ring, inclusion-exclusion area") {
    val u = RectUnion.union(Seq(rect(0, 0, 4, 3), rect(2, 1, 6, 5)))
    assert(u.area == 4 * 3 + 4 * 4 - 2 * 2)
    assert(u.nRings == 1)
    assert(u.nVertices == 8) // staircase octagon
  }

  test("disjoint rects: two rings, sum of areas") {
    val u = RectUnion.union(Seq(rect(0, 0, 2, 2), rect(5, 5, 7, 8)))
    assert(u.area == 4 + 6)
    assert(u.nRings == 2)
    assert(u.nVertices == 8)
  }

  test("frame of four rects leaves a hole (inner ring, negative shoelace)") {
    // 6×6 outer, 2..4 hole
    val u = RectUnion.union(Seq(
      rect(0, 0, 6, 2), rect(0, 4, 6, 6), rect(0, 2, 2, 4), rect(4, 2, 6, 4)))
    assert(u.area == 36 - 4)
    assert(u.nRings == 2)
    assert(u.nVertices == 8) // outer square + hole square
  }

  test("corner-touching rects stay separate rings") {
    val u = RectUnion.union(Seq(rect(0, 0, 2, 2), rect(2, 2, 4, 4)))
    assert(u.area == 8.0)
    assert(u.nRings == 2)
  }

  test("edge-touching rects merge into one ring") {
    val u = RectUnion.union(Seq(rect(0, 0, 2, 2), rect(2, 0, 4, 2)))
    assert(u.area == 8.0)
    assert(u.nRings == 1)
    assert(u.nVertices == 4) // collinear merge → plain rectangle
  }

  test("contained rect disappears") {
    val u = RectUnion.union(Seq(rect(0, 0, 10, 10), rect(2, 2, 5, 5)))
    assert(u.area == 100.0)
    assert(u.nRings == 1)
    assert(u.nVertices == 4)
  }
}
