package graft.geo

/** Polygon geometry: rings as flat coordinate arrays (x0,y0,x1,y1,...),
  * first ring = outer shell, rest = holes. Rings need not repeat the first
  * vertex at the end (both closed and open encodings are accepted).
  */
final case class Polygon(rings: Array[Array[Double]]) {
  lazy val bbox: BBox = {
    val outer = rings(0)
    var x0 = Double.MaxValue; var x1 = Double.MinValue
    var y0 = Double.MaxValue; var y1 = Double.MinValue
    var i = 0
    while (i < outer.length) {
      val x = outer(i); val y = outer(i + 1)
      if (x < x0) x0 = x; if (x > x1) x1 = x
      if (y < y0) y0 = y; if (y > y1) y1 = y
      i += 2
    }
    BBox(x0, x1, y0, y1)
  }

  def contains(x: Double, y: Double): Boolean = {
    if (!bbox.containsPoint(x, y)) return false
    if (!PIP.windingNonzero(rings(0), x, y)) return false
    var h = 1
    while (h < rings.length) {
      if (PIP.windingNonzero(rings(h), x, y)) return false
      h += 1
    }
    true
  }

  /** Coarse box-vs-polygon classification for covering refinement:
    * 0 = disjoint, 1 = fully inside, 2 = crossing. Exact for any ring
    * set (holes included): if no ring segment meets the closed box, the
    * box lies wholly inside or wholly outside the polygon's region, and
    * the center point decides which; boundary touches read as crossing
    * (superset-safe for a covering).
    */
  def classifyBox(b: BBox): Int = {
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val j = if (i == n - 1) 0 else i + 1
        if (b.intersectsSegment(ring(2 * i), ring(2 * i + 1),
            ring(2 * j), ring(2 * j + 1))) return 2
        i += 1
      }
      r += 1
    }
    if (contains(b.centerX, b.centerY)) 1 else 0
  }
}

object Polygon {
  def box(b: BBox): Polygon =
    Polygon(Array(Array(b.xMin, b.yMin, b.xMax, b.yMin, b.xMax, b.yMax, b.xMin, b.yMax)))
}

/** Winding-number point-in-polygon over flat ring arrays.
  *
  * This is the exact predicate the engine uses to replicate the
  * reference's cutline/PIP joins (reference reaches it through GDAL/OGR:
  * buteo/raster/clip.py:117-138, buteo/vector/intersect.py:63-65).
  * Nonzero winding; points exactly on an edge count as inside (matching
  * GDAL's all-touched-off center-in semantics closely enough for the
  * closed-boundary bbox algebra above).
  */
object PIP {
  /** Nonzero winding number test; `ring` is flat (x,y)* and wraps. */
  def windingNonzero(ring: Array[Double], px: Double, py: Double): Boolean = {
    var wn = 0
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = if (i == n - 1) 0 else i + 1
      val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
      val x2 = ring(2 * j); val y2 = ring(2 * j + 1)
      // skip zero-length closing segment of pre-closed rings
      if (x1 != x2 || y1 != y2) {
        val cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        if (y1 <= py) {
          if (y2 > py && cross > 0) wn += 1
          else if (cross == 0 && onSegment(x1, y1, x2, y2, px, py)) return true
        } else {
          if (y2 <= py && cross < 0) wn -= 1
          else if (cross == 0 && onSegment(x1, y1, x2, y2, px, py)) return true
        }
      }
      i += 1
    }
    wn != 0
  }

  private def onSegment(x1: Double, y1: Double, x2: Double, y2: Double,
                        px: Double, py: Double): Boolean =
    px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
      py >= math.min(y1, y2) && py <= math.max(y1, y2)

  /** Signed ring area (shoelace); positive = counter-clockwise. */
  def signedArea(ring: Array[Double]): Double = {
    var s = 0.0
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = if (i == n - 1) 0 else i + 1
      s += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      i += 1
    }
    s / 2.0
  }
}
