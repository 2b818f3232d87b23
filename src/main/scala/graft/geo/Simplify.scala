package graft.geo

/** Douglas–Peucker polyline / ring simplification (Douglas & Peucker
  * 1973 — the standard GIS vertex-reduction recipe; the reference's
  * toolbox has no analog, added for the vector-transform family).
  *
  * Deterministic by construction: a vertex is kept iff its squared
  * perpendicular distance from the current chord is STRICTLY greater
  * than eps² (GEOS semantics), ties on the split vertex go to the
  * lowest index, and the recursion order is fixed — so the result is a
  * pure per-geometry function, independent of parallelism or plan.
  * Distances are compared squared (no sqrt), all plain IEEE doubles.
  */
object Simplify {

  /** Squared perpendicular distance of p from the (a,b) chord;
    * degenerate chords (a == b) fall back to point distance from a.
    */
  private def distSq(ax: Double, ay: Double, bx: Double, by: Double,
                     px: Double, py: Double): Double = {
    val vx = bx - ax; val vy = by - ay
    val len2 = vx * vx + vy * vy
    if (len2 == 0) {
      val dx = px - ax; val dy = py - ay; dx * dx + dy * dy
    } else {
      val cr = vx * (py - ay) - vy * (px - ax)
      cr * cr / len2
    }
  }

  /** Simplify an OPEN polyline (flat x0,y0,x1,y1,… array). Endpoints
    * are always kept; interior vertices survive iff some chord sees
    * them farther than eps. Explicit work stack — no recursion-depth
    * limit on adversarial (sorted-spiral) inputs.
    */
  def polyline(pts: Array[Double], eps: Double): Array[Double] = {
    require(eps >= 0, s"simplify: eps must be >= 0, got $eps")
    require(pts.length % 2 == 0, "simplify: odd coordinate array")
    val n = pts.length / 2
    if (n <= 2) return pts.clone()
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val eps2 = eps * eps
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.head
      stack = stack.tail
      if (hi - lo > 1) {
        var best = -1
        var bestD = eps2 // keep requires d² STRICTLY > eps²
        var i = lo + 1
        while (i < hi) {
          val d = distSq(pts(2 * lo), pts(2 * lo + 1),
            pts(2 * hi), pts(2 * hi + 1), pts(2 * i), pts(2 * i + 1))
          if (d > bestD) { bestD = d; best = i }
          i += 1
        }
        if (best >= 0) {
          keep(best) = true
          stack = (lo, best) :: (best, hi) :: stack
        }
      }
    }
    val out = Array.newBuilder[Double]
    var i = 0
    while (i < n) {
      if (keep(i)) { out += pts(2 * i); out += pts(2 * i + 1) }
      i += 1
    }
    out.result()
  }

  /** Simplify a CLOSED ring given OPEN (no closing duplicate). The ring
    * is anchored at vertex 0 and the vertex farthest from it (first max
    * on ties), then each arc runs [[polyline]] — the standard ring
    * adaptation (a ring has no natural endpoints to pin). Returns the
    * simplified OPEN ring, or an empty array when it collapses below 3
    * vertices (degenerate — callers drop the ring).
    */
  def ring(r: Array[Double], eps: Double): Array[Double] = {
    require(r.length % 2 == 0, "simplify: odd coordinate array")
    val n = r.length / 2
    if (n < 3) return Array.empty
    var far = 1; var fd = -1.0
    var i = 1
    while (i < n) {
      val dx = r(2 * i) - r(0); val dy = r(2 * i + 1) - r(1)
      val d = dx * dx + dy * dy
      if (d > fd) { fd = d; far = i }
      i += 1
    }
    val arc1 = polyline(r.slice(0, 2 * (far + 1)), eps)
    val arc2 = polyline(r.slice(2 * far, 2 * n) ++ Array(r(0), r(1)), eps)
    // open ring = arc1 (0..far inclusive) + arc2 interior (its endpoints
    // far and 0 are already present)
    val combined = arc1 ++ arc2.slice(2, arc2.length - 2)
    if (combined.length < 6) Array.empty else combined
  }
}
