package graft.geo

/** OGR-ordered bounding box `[xMin, xMax, yMin, yMax]`.
  *
  * Semantics follow the reference engine's bbox algebra
  * (reference: buteo/bbox/bbox_class.py:33-679, buteo/bbox/operations.py,
  * buteo/bbox/validation.py). Dateline crossing is represented by
  * `xMin > xMax` (bbox_class.py:486-489, validation.py:88).
  */
final case class BBox(xMin: Double, xMax: Double, yMin: Double, yMax: Double) {

  def crossesDateline: Boolean = xMin > xMax

  def width: Double = xMax - xMin
  def height: Double = yMax - yMin
  def area: Double = width * height

  def centerX: Double = (xMin + xMax) / 2
  def centerY: Double = (yMin + yMax) / 2

  /** Point containment with dateline handling.
    * Reference: buteo/bbox/bbox_class.py:462-491.
    */
  def containsPoint(x: Double, y: Double): Boolean =
    if (crossesDateline) (x >= xMin || x <= xMax) && y >= yMin && y <= yMax
    else x >= xMin && x <= xMax && y >= yMin && y <= yMax

  /** Closed-boundary intersection test (edge/corner touch counts).
    * Reference: buteo/bbox/validation.py:220-310 (dateline branches included).
    */
  def intersects(o: BBox): Boolean = {
    val yOverlap = !(yMax < o.yMin || yMin > o.yMax)
    if (!yOverlap) false
    else {
      val aCross = crossesDateline
      val bCross = o.crossesDateline
      if (aCross && bCross) true
      else if (aCross) o.xMax >= xMin || o.xMin <= xMax
      else if (bCross) xMax >= o.xMin || xMin <= o.xMax
      else !(xMax < o.xMin || xMin > o.xMax)
    }
  }

  /** True if this bbox is completely within `o`.
    * Reference: buteo/bbox/validation.py:311-398.
    */
  def within(o: BBox): Boolean =
    xMin >= o.xMin && xMax <= o.xMax && yMin >= o.yMin && yMax <= o.yMax

  /** Bounding hull. Reference: buteo/bbox/operations.py:229-281. */
  def union(o: BBox): BBox =
    BBox(math.min(xMin, o.xMin), math.max(xMax, o.xMax),
         math.min(yMin, o.yMin), math.max(yMax, o.yMax))

  /** Intersection; caller must ensure `intersects(o)` (the reference raises
    * otherwise — operations.py:169-226). Corner touch yields a degenerate
    * box, e.g. [1,1,1,1].
    */
  def intersection(o: BBox): BBox =
    BBox(math.max(xMin, o.xMin), math.min(xMax, o.xMax),
         math.max(yMin, o.yMin), math.min(yMax, o.yMax))

  /** Closed-box segment intersection (Liang–Barsky): true iff the segment
    * (x1,y1)→(x2,y2) has at least one point inside or on the boundary.
    * Touching an edge or a corner counts — the adaptive-cover classifier
    * wants the superset-safe reading (a touched cell stays CROSSING).
    * Non-dateline boxes only (cell extents never cross the dateline).
    */
  def intersectsSegment(x1: Double, y1: Double, x2: Double, y2: Double): Boolean = {
    var t0 = 0.0
    var t1 = 1.0
    val dx = x2 - x1
    val dy = y2 - y1
    def clip(p: Double, q: Double): Boolean = {
      if (p == 0.0) q >= 0.0
      else {
        val r = q / p
        if (p < 0.0) { if (r > t1) return false; if (r > t0) t0 = r }
        else { if (r < t0) return false; if (r < t1) t1 = r }
        true
      }
    }
    clip(-dx, x1 - xMin) && clip(dx, xMax - x1) &&
      clip(-dy, y1 - yMin) && clip(dy, yMax - y1) && t0 <= t1
  }

  def toArray: Array[Double] = Array(xMin, xMax, yMin, yMax)
}

object BBox {
  /** Snap `target` outward onto the pixel grid anchored at `ref`'s top-left
    * corner with the given pixel size. Bit-for-bit port of the reference's
    * floor/ceil choices (buteo/bbox/operations.py:284-388, snap at :359-376).
    * `pixelHeight` is negative for north-up grids.
    */
  def alignToPixelSize(ref: BBox, target: BBox,
                       pixelWidth: Double, pixelHeight: Double): BBox = {
    require(pixelWidth > 0, s"pixel_width must be positive, got: $pixelWidth")
    require(math.abs(pixelHeight) >= 1e-15, "pixel_height cannot be zero")
    val ax0 = ref.xMin + math.floor((target.xMin - ref.xMin) / pixelWidth) * pixelWidth
    val ax1 = ref.xMin + math.ceil((target.xMax - ref.xMin) / pixelWidth) * pixelWidth
    val ay1 = ref.yMax + math.floor((target.yMax - ref.yMax) / pixelHeight) * pixelHeight
    val ay0 = ref.yMax + math.ceil((target.yMin - ref.yMax) / pixelHeight) * pixelHeight
    val (x0, x1) = if (ax0 > ax1) (ax1, ax0) else (ax0, ax1)
    val (y0, y1) = if (ay0 > ay1) (ay1, ay0) else (ay0, ay1)
    BBox(x0, x1, y0, y1)
  }
}
