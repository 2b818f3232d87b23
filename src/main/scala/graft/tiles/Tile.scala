package graft.tiles

import graft.geo.{BBox, GeoTransform}

/** One raster tile = one Dataset row (SURVEY.md §1.2): the distributed
  * replacement for the reference's in-memory C×H×W blocks
  * (reference: buteo/core_raster/core_raster_array.py:27-126).
  *
  * `pixels` is row-major `h × w`, one band per row. Pixel (col, row) of the
  * tile is `pixels(row * w + col)`; its geo position comes from the tile's
  * own geotransform (originX/originY = tile top-left corner).
  * Values are doubles so small-integer payloads survive any engine
  * bit-for-bit; nodata is a sentinel (reference: masked_equal semantics,
  * core_raster_array.py:118-125).
  */
final case class Tile(
    cellX: Int, cellY: Int, band: Int,
    w: Int, h: Int,
    originX: Double, originY: Double, pxW: Double, pxH: Double,
    pixels: Array[Double],
    nodata: Double, crs: Int) {

  def geot: GeoTransform = GeoTransform(originX, pxW, 0.0, originY, 0.0, pxH)
  def bbox: BBox = geot.bbox(w, h)

  /** Geo center of pixel (col, row) — buteo/raster/coordinates.py:49-53. */
  def pixelCenter(col: Int, row: Int): (Double, Double) =
    (originX + (col + 0.5) * pxW, originY + (row + 0.5) * pxH)
}

/** A raster = a tile grid spec: global geotransform + size + tile size.
  * Tile (cx, cy) holds pixels [cx*t, min((cx+1)t, w)) × [cy*t, ...) —
  * border tiles shrink (reference border strategy 3,
  * buteo/core_raster/core_raster_offsets.py:160-164).
  */
final case class RasterSpec(originX: Double, originY: Double,
                            pxW: Double, pxH: Double,
                            width: Int, height: Int,
                            tileSize: Int, bands: Int,
                            nodata: Double = -9999.0, crs: Int = 4326) {
  def tilesX: Int = (width + tileSize - 1) / tileSize
  def tilesY: Int = (height + tileSize - 1) / tileSize
  def numTiles: Int = tilesX * tilesY * bands

  def tileW(cx: Int): Int = math.min(tileSize, width - cx * tileSize)
  def tileH(cy: Int): Int = math.min(tileSize, height - cy * tileSize)

  def tileOrigin(cx: Int, cy: Int): (Double, Double) =
    (originX + cx.toDouble * tileSize * pxW, originY + cy.toDouble * tileSize * pxH)

  def geot: GeoTransform = GeoTransform(originX, pxW, 0.0, originY, 0.0, pxH)
  def bbox: BBox = geot.bbox(width, height)
}
