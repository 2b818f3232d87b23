package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class HullSpec extends AnyFunSuite {

  /** O(n³) brute-force hull membership: p is a hull vertex iff it is NOT
    * strictly inside the hull — i.e. there is a half-plane through p with
    * all other points on one side. Used only as an independent oracle.
    */
  private def bruteHullSet(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val distinct = pts.distinct
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    distinct.filter { p =>
      distinct.exists { q =>
        q != p && {
          // all other points strictly on/left of the directed line p->q
          // for SOME q means p is on the boundary; test both sides
          val others = distinct.filterNot(x => x == p || x == q)
          others.forall(cross(p, q, _) >= 0) || others.forall(cross(p, q, _) <= 0)
        }
      } || distinct.size == 1
    }.toSet
  }

  private def toPairs(flat: Array[Double]): Seq[(Double, Double)] =
    (0 until flat.length / 2).map(i => (flat(2 * i), flat(2 * i + 1)))

  test("monotone chain matches brute-force extreme-point set on random inputs") {
    val rnd = new scala.util.Random(12345)
    for (trial <- 0 until 200) {
      val n = 3 + rnd.nextInt(20)
      // integer lattice points: exact arithmetic, collisions + collinear
      // runs are common — the hard cases
      val pts = Seq.fill(n)((rnd.nextInt(8).toDouble, rnd.nextInt(8).toDouble))
      val flat = pts.flatMap(p => Seq(p._1, p._2)).toArray
      val hull = toPairs(Hull.convexHull(flat))
      // 1. hull vertices are a subset of the input
      assert(hull.forall(pts.contains), s"trial $trial: hull not subset")
      // 2. strictly convex + CCW: every consecutive triple turns left
      if (hull.size >= 3) {
        val m = hull.size
        for (i <- 0 until m) {
          val o = hull(i); val a = hull((i + 1) % m); val b = hull((i + 2) % m)
          val c = (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
          assert(c > 0, s"trial $trial: non-left turn at $i ($o $a $b)")
        }
      }
      // 3. every input point inside or on the hull
      if (hull.size >= 3) {
        val m = hull.size
        pts.foreach { p =>
          val inside = (0 until m).forall { i =>
            val o = hull(i); val a = hull((i + 1) % m)
            (a._1 - o._1) * (p._2 - o._2) - (a._2 - o._2) * (p._1 - o._1) >= 0
          }
          assert(inside, s"trial $trial: $p outside hull")
        }
      }
      // 4. strict hull vertex set == brute-force extreme points that are
      //    corners (brute set may include collinear boundary points; the
      //    strict hull must be exactly the corner subset)
      val corners = hull.toSet
      val brute = bruteHullSet(pts)
      assert(corners.subsetOf(brute), s"trial $trial: corner not extreme")
    }
  }

  test("degenerate inputs: point, segment, collinear run") {
    assert(Hull.convexHull(Array(1.0, 2.0)).toSeq == Seq(1.0, 2.0))
    assert(Hull.convexHull(Array(1.0, 2.0, 1.0, 2.0)).toSeq == Seq(1.0, 2.0))
    val seg = Hull.convexHull(Array(0.0, 0.0, 2.0, 2.0, 1.0, 1.0))
    assert(seg.toSeq == Seq(0.0, 0.0, 2.0, 2.0)) // two extremes only
  }

  test("ringLength: unit square = 4, with closing duplicate unchanged") {
    assert(Hull.ringLength(Array(0, 0, 1, 0, 1, 1, 0, 1).map(_.toDouble)) == 4.0)
    assert(Hull.ringLength(Array(0, 0, 1, 0, 1, 1, 0, 1, 0, 0).map(_.toDouble)) == 4.0)
  }
}
