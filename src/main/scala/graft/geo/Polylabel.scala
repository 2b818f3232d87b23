package graft.geo

/** Pole of inaccessibility — the interior point farthest from the
  * boundary — via the Mapbox polylabel quadtree refinement (Agafonkin
  * 2016; the published guaranteed-precision variant of Garcia-Castellanos
  * & Lombardo 2007). A pure per-polygon computation (the natural label
  * anchor / buffer-safety radius the reference's vector attribute surface
  * stops short of), so the Spark op is embarrassingly map-only.
  *
  * Determinism contract (what makes the output pinnable): the priority
  * queue orders by (potential, h, cx, cy) — a TOTAL order over cells —
  * and `best` only moves on a STRICT distance improvement, so the
  * refinement sequence and the answer are identical on every run and at
  * every parallelism.
  */
object Polylabel {

  /** Signed distance to the polygon boundary: positive inside. */
  def signedDist(p: Polygon, x: Double, y: Double): Double = {
    var minSq = Double.MaxValue
    var r = 0
    while (r < p.rings.length) {
      val ring = p.rings(r)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val j = if (i == n - 1) 0 else i + 1
        val ax = ring(2 * i); val ay = ring(2 * i + 1)
        val bx = ring(2 * j); val by = ring(2 * j + 1)
        val dx = bx - ax; val dy = by - ay
        val len2 = dx * dx + dy * dy
        val t = if (len2 == 0.0) 0.0 else {
          val raw = ((x - ax) * dx + (y - ay) * dy) / len2
          if (raw < 0.0) 0.0 else if (raw > 1.0) 1.0 else raw
        }
        val px = ax + t * dx; val py = ay + t * dy
        val sq = (x - px) * (x - px) + (y - py) * (y - py)
        if (sq < minSq) minSq = sq
        i += 1
      }
      r += 1
    }
    val d = math.sqrt(minSq)
    if (p.contains(x, y)) d else -d
  }

  private val Sqrt2 = math.sqrt(2.0)

  private final case class Cell(cx: Double, cy: Double, h: Double, d: Double) {
    def potential: Double = d + h * Sqrt2
  }

  private implicit val cellOrd: Ordering[Cell] =
    Ordering.by((c: Cell) => (c.potential, c.h, c.cx, c.cy))

  /** Outer-ring area centroid (the standard warm-start cell). */
  private def centroidCell(p: Polygon): Cell = {
    val ring = p.rings(0)
    val n = ring.length / 2
    var a = 0.0; var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < n) {
      val j = if (i == n - 1) 0 else i + 1
      val cross = ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      a += cross
      sx += (ring(2 * i) + ring(2 * j)) * cross
      sy += (ring(2 * i + 1) + ring(2 * j + 1)) * cross
      i += 1
    }
    if (a == 0.0) Cell(ring(0), ring(1), 0.0, signedDist(p, ring(0), ring(1)))
    else {
      val cx = sx / (3.0 * a); val cy = sy / (3.0 * a)
      Cell(cx, cy, 0.0, signedDist(p, cx, cy))
    }
  }

  /** (x, y, distance) of the pole of inaccessibility at `precision`.
    *
    * `maxCells` bounds the refinement (deterministic loud failure instead
    * of OOM): a polygon whose clearance maximum is a flat RIDGE (e.g. a
    * long rectangle's medial spine) has Θ(L/h) near-optimal cells at
    * every size h, so the frontier doubles per level and a precision far
    * below the feature scale explodes combinatorially — pick precision
    * ≳ 1e-6 × the short-side length, not an absolute constant.
    */
  def pole(p: Polygon, precision: Double = 1e-6,
           maxCells: Int = 4 << 20): (Double, Double, Double) = {
    val b = p.bbox
    val w = b.xMax - b.xMin; val hgt = b.yMax - b.yMin
    val cellSize = math.min(w, hgt)
    if (cellSize == 0.0) return (b.xMin, b.yMin, 0.0)
    var h = cellSize / 2.0
    val pq = scala.collection.mutable.PriorityQueue.empty[Cell]
    var x = b.xMin
    while (x < b.xMax) {
      var y = b.yMin
      while (y < b.yMax) {
        pq += Cell(x + h, y + h, h, signedDist(p, x + h, y + h))
        y += cellSize
      }
      x += cellSize
    }
    var best = centroidCell(p)
    val bc = Cell(b.centerX, b.centerY, 0.0, signedDist(p, b.centerX, b.centerY))
    if (bc.d > best.d) best = bc
    var popped = 0
    while (pq.nonEmpty) {
      val c = pq.dequeue()
      popped += 1
      require(popped <= maxCells,
        s"Polylabel: $maxCells cells refined without reaching precision " +
          s"$precision — flat-ridge maximum; raise precision or maxCells")
      if (c.d > best.d) best = Cell(c.cx, c.cy, 0.0, c.d)
      if (c.potential - best.d > precision) {
        h = c.h / 2.0
        pq += Cell(c.cx - h, c.cy - h, h, signedDist(p, c.cx - h, c.cy - h))
        pq += Cell(c.cx + h, c.cy - h, h, signedDist(p, c.cx + h, c.cy - h))
        pq += Cell(c.cx - h, c.cy + h, h, signedDist(p, c.cx - h, c.cy + h))
        pq += Cell(c.cx + h, c.cy + h, h, signedDist(p, c.cx + h, c.cy + h))
      }
    }
    (best.cx, best.cy, best.d)
  }
}
