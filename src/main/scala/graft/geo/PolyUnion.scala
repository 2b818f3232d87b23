package graft.geo

/** General (non-rectilinear) polygon union via noding + side
  * classification + angular ring tracing:
  *
  *   1. every input edge is split ("noded") at its intersections with
  *      every other edge — proper crossings, T-junctions, and collinear
  *      overlaps all become shared sub-segment endpoints;
  *   2. each sub-segment is kept iff exactly one of its two sides lies
  *      inside the union: coverage is sampled at the midpoint offset a
  *      small distance along each normal and counted against all input
  *      polygons (shared boundaries between inputs — covered on both
  *      sides — drop out; duplicated boundary sub-segments from
  *      coincident edges are deduped on quantized endpoints). Kept
  *      segments are oriented interior-on-the-LEFT;
  *   3. rings are traced with the sharpest-left-turn rule (the
  *      general-angle form of RectUnion's corner preference), so
  *      self-touching unions stay consistent; outer rings come out CCW
  *      (positive shoelace), holes CW, and the shoelace sum over all
  *      assembled rings IS the union area.
  *
  * Midpoint-offset classification is exact for inputs whose features are
  * larger than the noding quantum (1e-9 of the coordinate span): an
  * offset LADDER (1e-7 → 1e-10 → 1e-13 of span) re-samples closer when
  * both sides test outside, so slivers far thinner than the base offset
  * classify correctly (property-tested down to 1e-8·span). Features at
  * or below the quantum itself are NOT robust — that territory needs
  * exact-rational noding à la Martínez–Rueda 2009 or JTS OverlayNG
  * snap-rounding (both published; staged).
  *
  * Reference semantics: buteo/vector/dissolve.py:101-116 reaches
  * ST_Union through SQLite/GEOS; this is the from-scratch Spark-side
  * equivalent used per dissolve group.
  */
object PolyUnion {

  /** Union of simple polygons (holes honored via Polygon.contains). */
  def union(polys: Seq[Polygon]): RectUnion.Union = {
    def cov(x: Double, y: Double): Int = {
      var c = 0; var p = 0
      while (p < polys.length) { if (polys(p).contains(x, y)) c += 1; p += 1 }
      c
    }
    overlayEdges(polys, (x, y) => cov(x, y) > 0)
  }

  /** Generic boolean overlay of two polygon sets via the same
    * noding + side-classification + tracing kernel: a sub-segment is on
    * the result boundary iff `keep(inA, inB)` differs across its two
    * sides — Intersection = `_ && _` (the clip kernel, reference:
    * buteo/vector/clip.py:1-260 via GDAL/GEOS Intersection),
    * Difference = `_ && !_`, Union = `_ || _`, Xor = `_ != _`.
    */
  def overlay(a: Seq[Polygon], b: Seq[Polygon],
              keep: (Boolean, Boolean) => Boolean): RectUnion.Union =
    overlayEdges(a ++ b, (x, y) =>
      keep(a.exists(_.contains(x, y)), b.exists(_.contains(x, y))))

  /** Core kernel: node all edges of `polys`, keep sub-segments where the
    * `inside` predicate differs between the two side samples, orient
    * interior-on-left, trace rings.
    */
  private def overlayEdges(polys: Seq[Polygon],
                           inside: (Double, Double) => Boolean): RectUnion.Union = {
    // --- gather directed input edges (orientation irrelevant here) ---
    val ax = collection.mutable.ArrayBuffer.empty[Double]
    val ay = collection.mutable.ArrayBuffer.empty[Double]
    val bx = collection.mutable.ArrayBuffer.empty[Double]
    val by = collection.mutable.ArrayBuffer.empty[Double]
    polys.foreach { p =>
      p.rings.foreach { r =>
        val n = r.length / 2
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          val x1 = r(2 * i); val y1 = r(2 * i + 1)
          val x2 = r(2 * j); val y2 = r(2 * j + 1)
          if (x1 != x2 || y1 != y2) { // skip explicit ring closure / dup verts
            ax += x1; ay += y1; bx += x2; by += y2
          }
          i += 1
        }
      }
    }
    val m = ax.length
    if (m == 0) return RectUnion.Union(0.0, Seq.empty)

    // coordinate span → offset + quantization scales
    var lo = Double.MaxValue; var hi = Double.MinValue
    var i = 0
    while (i < m) {
      lo = math.min(lo, math.min(math.min(ax(i), bx(i)), math.min(ay(i), by(i))))
      hi = math.max(hi, math.max(math.max(ax(i), bx(i)), math.max(ay(i), by(i))))
      i += 1
    }
    val span = math.max(hi - lo, 1e-12)
    val offset = span * 1e-7
    val quantum = span * 1e-9

    // --- 1. node all edges ---
    def cross(x1: Double, y1: Double, x2: Double, y2: Double): Double = x1 * y2 - x2 * y1
    val subs = collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    i = 0
    while (i < m) {
      val dx = bx(i) - ax(i); val dy = by(i) - ay(i)
      val len2 = dx * dx + dy * dy
      val ts = collection.mutable.ArrayBuffer(0.0, 1.0)
      var j = 0
      while (j < m) {
        if (j != i) {
          val ex = bx(j) - ax(j); val ey = by(j) - ay(j)
          val wx = ax(j) - ax(i); val wy = ay(j) - ay(i)
          val denom = cross(dx, dy, ex, ey)
          val tolArea = 1e-12 * span * span
          if (math.abs(denom) > tolArea) {
            val t = cross(wx, wy, ex, ey) / denom
            val u = cross(wx, wy, dx, dy) / denom
            if (t > 0.0 && t < 1.0 && u >= -1e-12 && u <= 1.0 + 1e-12) ts += t
          } else if (math.abs(cross(wx, wy, dx, dy)) <= tolArea) {
            // collinear: project the other edge's endpoints onto this one
            val t1 = (wx * dx + wy * dy) / len2
            val t2 = ((bx(j) - ax(i)) * dx + (by(j) - ay(i)) * dy) / len2
            if (t1 > 0.0 && t1 < 1.0) ts += t1
            if (t2 > 0.0 && t2 < 1.0) ts += t2
          }
        }
        j += 1
      }
      val sorted = ts.sorted.toArray
      var k = 0
      var prev = 0.0
      var first = true
      while (k < sorted.length) {
        val t = sorted(k)
        if (first || t - prev > 1e-12) {
          if (!first) {
            subs += ((ax(i) + prev * dx, ay(i) + prev * dy,
              ax(i) + t * dx, ay(i) + t * dy))
          }
          prev = t; first = false
        }
        k += 1
      }
      i += 1
    }

    // --- 2. classify sides; keep boundary sub-segments interior-on-left ---
    def q(v: Double): Long = math.round(v / quantum)
    val seen = collection.mutable.HashSet.empty[(Long, Long, Long, Long)]
    val segs = collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    subs.foreach { case (x1, y1, x2, y2) =>
      val mx = (x1 + x2) * 0.5; val my = (y1 + y2) * 0.5
      val dx = x2 - x1; val dy = y2 - y1
      val len = math.sqrt(dx * dx + dy * dy)
      if (len > quantum) {
        val nx = -dy / len; val ny = dx / len // left normal
        // offset LADDER (robustness for thin features): if both side
        // samples land OUTSIDE at the base offset, the feature may be
        // thinner than the offset — retry closer (×1e-3, ×1e-6) before
        // declaring the segment an exterior duplicate. Both-sides-INSIDE
        // stops immediately: that is a genuine interior shared boundary
        // at every scale.
        var dir = 0
        var step = 0
        var decided = false
        while (!decided && step < 3) {
          val o = offset * math.pow(1e-3, step)
          val inL = inside(mx + nx * o, my + ny * o)
          val inR = inside(mx - nx * o, my - ny * o)
          if (inL && !inR) { dir = 1; decided = true }
          else if (inR && !inL) { dir = -1; decided = true }
          else if (inL && inR) decided = true // interior duplicate
          else step += 1 // both outside: maybe a sliver thinner than o
        }
        if (dir != 0) {
          val key =
            if (dir > 0) (q(x1), q(y1), q(x2), q(y2)) else (q(x2), q(y2), q(x1), q(y1))
          if (seen.add(key)) {
            if (dir > 0) segs += ((x1, y1, x2, y2)) else segs += ((x2, y2, x1, y1))
          }
        }
      }
    }

    // --- 3. trace rings: sharpest-left turn at shared vertices ---
    val segArr = segs.sortBy(s => (q(s._1), q(s._2), q(s._3), q(s._4))).toArray
    val outMap = collection.mutable.HashMap.empty[(Long, Long), List[Int]]
    i = segArr.length - 1
    while (i >= 0) {
      val k = (q(segArr(i)._1), q(segArr(i)._2))
      outMap(k) = i :: outMap.getOrElse(k, Nil)
      i -= 1
    }
    val used = new Array[Boolean](segArr.length)
    val rings = collection.mutable.ArrayBuffer.empty[Array[Double]]
    var start = 0
    while (start < segArr.length) {
      if (!used(start)) {
        val verts = collection.mutable.ArrayBuffer.empty[(Double, Double)]
        val origin = (q(segArr(start)._1), q(segArr(start)._2))
        var cur = start
        var ok = true
        var done = false
        var steps = 0
        while (!done && ok) {
          used(cur) = true
          val s = segArr(cur)
          val k = (q(s._1), q(s._2))
          outMap(k) = outMap(k).filterNot(_ == cur)
          verts += ((s._1, s._2))
          val nk = (q(s._3), q(s._4))
          steps += 1
          if (nk == origin) done = true
          else if (steps > segArr.length) ok = false // fp guard: unclosed ring
          else {
            val cands = outMap.getOrElse(nk, Nil)
            if (cands.isEmpty) ok = false
            else {
              val dx = s._3 - s._1; val dy = s._4 - s._2
              cur = cands.maxBy { ci =>
                val c = segArr(ci)
                val cx = c._3 - c._1; val cy = c._4 - c._2
                val ang = math.atan2(dx * cy - dy * cx, dx * cx + dy * cy)
                if (ang > math.Pi - 1e-9) -math.Pi - 1.0 else ang // back = worst
              }
            }
          }
        }
        if (ok && verts.length >= 3) {
          // merge collinear runs (same direction, ~zero turn)
          val n = verts.length
          val keep = (0 until n).filter { vi =>
            val p = verts((vi - 1 + n) % n); val c = verts(vi); val nx = verts((vi + 1) % n)
            val ux = c._1 - p._1; val uy = c._2 - p._2
            val vx = nx._1 - c._1; val vy = nx._2 - c._2
            math.abs(ux * vy - uy * vx) > 1e-9 * span * span * 1e-3 ||
              (ux * vx + uy * vy) < 0
          }.map(verts(_)).toArray
          if (keep.length >= 3) {
            val minIdx = keep.indices.minBy(vi => (keep(vi)._1, keep(vi)._2))
            val rot = keep.drop(minIdx) ++ keep.take(minIdx)
            val flat = new Array[Double](rot.length * 2)
            var o = 0
            while (o < rot.length) {
              flat(2 * o) = rot(o)._1; flat(2 * o + 1) = rot(o)._2; o += 1
            }
            rings += flat
          }
        }
      }
      start += 1
    }

    var area2 = 0.0
    rings.foreach { r =>
      val n = r.length / 2
      var j = 0
      while (j < n) {
        val k2 = (j + 1) % n
        area2 += r(2 * j) * r(2 * k2 + 1) - r(2 * k2) * r(2 * j + 1)
        j += 1
      }
    }
    RectUnion.Union(area2 * 0.5, rings.toSeq)
  }
}
