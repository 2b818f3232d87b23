package graft.geo

/** Polygon↔cell coverage fractions — the exactextract / ESRI
  * TabulateArea primitive that upgrades zonal statistics from
  * center-in-cell sampling to area-weighted aggregation. Convex clip via
  * Sutherland–Hodgman (the cell is the convex clipper), area via the
  * shoelace fold over the clipped ring.
  */
object ClipArea {

  /** Ring clipped to the axis-aligned box, Sutherland–Hodgman: clip
    * successively against x>=x0, x<=x1, y>=y0, y<=y1. `ring` is flat
    * (x,y)* without a repeated closing vertex.
    */
  def clipRingToBox(ring: Array[Double], x0: Double, y0: Double,
                    x1: Double, y1: Double): Array[Double] = {
    // edge: 0 left, 1 right, 2 bottom, 3 top
    def inside(x: Double, y: Double, e: Int): Boolean = e match {
      case 0 => x >= x0
      case 1 => x <= x1
      case 2 => y >= y0
      case _ => y <= y1
    }
    def cross(ax: Double, ay: Double, bx: Double, by: Double, e: Int): (Double, Double) =
      e match {
        case 0 => (x0, ay + (by - ay) * (x0 - ax) / (bx - ax))
        case 1 => (x1, ay + (by - ay) * (x1 - ax) / (bx - ax))
        case 2 => (ax + (bx - ax) * (y0 - ay) / (by - ay), y0)
        case _ => (ax + (bx - ax) * (y1 - ay) / (by - ay), y1)
      }
    var cur = ring
    var e = 0
    while (e < 4 && cur.length >= 6) {
      val out = new scala.collection.mutable.ArrayBuffer[Double](cur.length + 4)
      val n = cur.length / 2
      var i = 0
      while (i < n) {
        val j = if (i == n - 1) 0 else i + 1
        val ax = cur(2 * i); val ay = cur(2 * i + 1)
        val bx = cur(2 * j); val by = cur(2 * j + 1)
        val ain = inside(ax, ay, e); val bin = inside(bx, by, e)
        if (ain) { out += ax; out += ay }
        if (ain != bin) {
          val (cx, cy) = cross(ax, ay, bx, by, e)
          out += cx; out += cy
        }
        i += 1
      }
      cur = out.toArray
      e += 1
    }
    if (cur.length >= 6) cur else Array.empty[Double]
  }

  /** Signed shoelace area of a flat ring (positive = CCW). */
  def shoelace(ring: Array[Double]): Double = {
    val n = ring.length / 2
    var a = 0.0
    var i = 0
    while (i < n) {
      val j = if (i == n - 1) 0 else i + 1
      a += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      i += 1
    }
    a / 2.0
  }

  /** |polygon ∩ [x0,x1]×[y0,y1]| — outer ring minus holes, each clipped
    * independently (valid because the clip window is convex and holes
    * lie inside the shell).
    */
  def intersectionArea(p: Polygon, x0: Double, y0: Double,
                       x1: Double, y1: Double): Double = {
    var a = math.abs(shoelace(clipRingToBox(toOpenRing(p.rings(0)), x0, y0, x1, y1)))
    var h = 1
    while (h < p.rings.length) {
      a -= math.abs(shoelace(clipRingToBox(toOpenRing(p.rings(h)), x0, y0, x1, y1)))
      h += 1
    }
    a
  }

  private def toOpenRing(r: Array[Double]): Array[Double] = {
    val n = r.length
    if (n >= 4 && r(0) == r(n - 2) && r(1) == r(n - 1))
      java.util.Arrays.copyOf(r, n - 2)
    else r
  }

  /** Ring clipped to the box (open form, possibly closed input), with
    * consecutive-duplicate vertices collapsed (Sutherland–Hodgman emits
    * them when a vertex lies ON a clip edge). Empty result ⇒ no overlap.
    */
  def clipRing(ring: Array[Double], x0: Double, y0: Double,
               x1: Double, y1: Double): Array[Double] =
    dedupVertices(clipRingToBox(toOpenRing(ring), x0, y0, x1, y1))

  private def dedupVertices(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    if (n == 0) return r
    val out = new scala.collection.mutable.ArrayBuffer[Double](r.length)
    var i = 0
    while (i < n) {
      val j = if (i == n - 1) 0 else i + 1
      if (r(2 * i) != r(2 * j) || r(2 * i + 1) != r(2 * j + 1)) {
        out += r(2 * i); out += r(2 * i + 1)
      }
      i += 1
    }
    if (out.length >= 6) out.toArray else Array.empty[Double]
  }

  /** Canonical form of an open ring: rotated to start at the
    * lexicographically smallest (x, y) vertex, oriented CCW when
    * `ccw` (shell convention) else CW (hole convention). Makes clip
    * output independent of the clipper's emission order — required for
    * string-exact WKT oracles and stable dedup keys.
    */
  def canonicalRing(ring: Array[Double], ccw: Boolean): Array[Double] = {
    val n = ring.length / 2
    if (n == 0) return ring
    val oriented =
      if ((shoelace(ring) >= 0.0) == ccw) ring
      else {
        val rev = new Array[Double](ring.length)
        var i = 0
        while (i < n) {
          rev(2 * i) = ring(2 * (n - 1 - i))
          rev(2 * i + 1) = ring(2 * (n - 1 - i) + 1)
          i += 1
        }
        rev
      }
    var best = 0
    var i = 1
    while (i < n) {
      val bx = oriented(2 * best); val by = oriented(2 * best + 1)
      val x = oriented(2 * i); val y = oriented(2 * i + 1)
      if (x < bx || (x == bx && y < by)) best = i
      i += 1
    }
    val out = new Array[Double](ring.length)
    i = 0
    while (i < n) {
      val s = (best + i) % n
      out(2 * i) = oriented(2 * s); out(2 * i + 1) = oriented(2 * s + 1)
      i += 1
    }
    out
  }
}
