package graft.geo

/** Convex hull via Andrew's monotone chain (the standard public
  * O(n log n) construction). Used by the shape-characteristics op
  * (reference: buteo/core_vector/core_vector_characteristics.py:152 —
  * GDAL `ConvexHull()`).
  */
object Hull {

  /** Convex hull of a flat (x0,y0,x1,y1,…) point array, returned as a
    * flat CCW ring WITHOUT the closing duplicate. Collinear boundary
    * points are dropped (strict hull, matching GEOS). Degenerate inputs
    * (<3 distinct points, or all collinear) return the chain itself
    * (0/1/2-point "hull" or the two extreme points).
    */
  def convexHull(flat: Array[Double]): Array[Double] = {
    val n = flat.length / 2
    // sort lexicographically by (x, y), dropping exact duplicates
    val idx = Array.tabulate(n)(i => i).sortBy(i => (flat(2 * i), flat(2 * i + 1)))
    val pts = collection.mutable.ArrayBuffer.empty[(Double, Double)]
    idx.foreach { i =>
      val p = (flat(2 * i), flat(2 * i + 1))
      if (pts.isEmpty || pts.last != p) pts += p
    }
    val m = pts.length
    if (m <= 2) return pts.flatMap(p => Seq(p._1, p._2)).toArray

    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)

    val hull = new Array[(Double, Double)](2 * m)
    var k = 0
    // lower hull
    var i = 0
    while (i < m) {
      while (k >= 2 && cross(hull(k - 2), hull(k - 1), pts(i)) <= 0) k -= 1
      hull(k) = pts(i); k += 1; i += 1
    }
    // upper hull
    val lower = k + 1
    i = m - 2
    while (i >= 0) {
      while (k >= lower && cross(hull(k - 2), hull(k - 1), pts(i)) <= 0) k -= 1
      hull(k) = pts(i); k += 1; i -= 1
    }
    // last point equals the first; k-1 points form the CCW ring
    val out = new Array[Double](2 * (k - 1))
    i = 0
    while (i < k - 1) { out(2 * i) = hull(i)._1; out(2 * i + 1) = hull(i)._2; i += 1 }
    out
  }

  /** Closed-ring length of a flat unclosed ring (perimeter). */
  def ringLength(flat: Array[Double]): Double = {
    val n = flat.length / 2
    if (n < 2) return 0.0
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val dx = flat(2 * j) - flat(2 * i)
      val dy = flat(2 * j + 1) - flat(2 * i + 1)
      s += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    s
  }
}
