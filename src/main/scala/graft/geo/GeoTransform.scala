package graft.geo

/** GDAL-style affine geotransform
  * `[originX, pixelWidth, rowSkew, originY, colSkew, pixelHeight]`,
  * `pixelHeight` negative for north-up grids.
  *
  * All grid math is a semantic port of the reference's bbox/offset
  * arithmetic (reference: buteo/bbox/operations.py:19-643) — including its
  * exact rint (half-even) / floor / ceil choices, because those determine
  * row-for-row tile assignment.
  */
final case class GeoTransform(originX: Double, pxW: Double, rowSkew: Double,
                              originY: Double, colSkew: Double, pxH: Double) {

  /** Pixel offsets of `bbox` within this grid: (xStart, yStart, xSize, ySize).
    * Reference: buteo/bbox/operations.py:19-95 (np.rint = half-even; Scala
    * `math.rint` matches).
    */
  def pixelOffsets(b: BBox): (Int, Int, Int, Int) = {
    val xStart = math.rint((b.xMin - originX) / pxW).toInt
    val yStart = math.rint((b.yMax - originY) / pxH).toInt
    val xSize = math.abs(math.rint((b.xMax - b.xMin) / pxW).toInt)
    val ySize = math.abs(math.rint((b.yMin - b.yMax) / pxH).toInt)
    (xStart, yStart, xSize, ySize)
  }

  /** Extent of a `w`×`h`-pixel raster on this grid.
    * Reference: buteo/bbox/operations.py:98-166.
    */
  def bbox(w: Long, h: Long): BBox = {
    val x0 = originX
    val y1 = originY
    val x1 = originX + w * pxW
    val y0 = originY + h * pxH
    BBox(math.min(x0, x1), math.max(x0, x1), math.min(y0, y1), math.max(y0, y1))
  }

  /** Sub-grid for `bbox`: new geotransform + pixel dims.
    * Reference: buteo/bbox/operations.py:560-643 (np.rint before int cast).
    */
  def subGrid(b: BBox): (GeoTransform, Int, Int) = {
    val w = math.abs(math.rint((b.xMax - b.xMin) / pxW).toInt)
    val h = math.abs(math.rint((b.yMax - b.yMin) / math.abs(pxH)).toInt)
    (GeoTransform(b.xMin, pxW, rowSkew, b.yMax, colSkew, pxH), w, h)
  }

  /** Geo coordinates of the top-left corner of pixel (col, row). */
  def pixelToGeo(col: Double, row: Double): (Double, Double) =
    (originX + col * pxW + row * rowSkew, originY + col * colSkew + row * pxH)

  /** Center coordinates of pixel (col, row) — reference pixel-center grids
    * at buteo/raster/coordinates.py:49-53 (linspace centers ± half pixel).
    */
  def pixelCenter(col: Int, row: Int): (Double, Double) =
    (originX + (col + 0.5) * pxW, originY + (row + 0.5) * pxH)

  /** Pixel (col, row) containing geo point (x, y) — floor semantics. */
  def geoToPixel(x: Double, y: Double): (Int, Int) =
    (math.floor((x - originX) / pxW).toInt, math.floor((y - originY) / pxH).toInt)

  /** Origin-shifted copy (georeference-only move).
    * Reference: buteo/raster/shift.py:67-69.
    */
  def shift(dx: Double, dy: Double): GeoTransform =
    copy(originX = originX + dx, originY = originY + dy)

  def toArray: Array[Double] = Array(originX, pxW, rowSkew, originY, colSkew, pxH)
}

object GeoTransform {
  /** North-up grid from a bbox and pixel dims.
    * Reference: buteo/bbox/operations.py:481-557 (pixel height forced
    * negative).
    */
  def fromBBox(b: BBox, w: Int, h: Int): GeoTransform = {
    require(w > 0 && h > 0, "raster dimensions must be positive")
    val pw = (b.xMax - b.xMin) / w.toDouble
    val ph = (b.yMax - b.yMin) / h.toDouble
    GeoTransform(b.xMin, pw, 0.0, b.yMax, 0.0, -math.abs(ph))
  }
}
