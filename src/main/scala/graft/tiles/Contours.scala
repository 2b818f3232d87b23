package graft.tiles

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset

/** Marching-squares contour extraction — the raster→vector isoline step
  * (Lorensen & Cline's 2-D ancestor; the natural companion to the
  * engine's vectorize/polygonize family, reference surface:
  * buteo/raster/vectorize.py which stops at region polygonization).
  *
  * Every 2×2 pixel cell emits the 0, 1 or 2 line segments of the level
  * crossing, with linearly interpolated endpoints in PIXEL coordinates
  * (callers map to geo via the raster's geotransform — an affine map
  * that does not change topology). Saddle cells (two opposite corners
  * inside) are disambiguated by the cell-center average, the standard
  * midpoint decider.
  *
  * Scale shape: ONE radius-1 halo exchange (the shared convolvePad
  * machinery) then pure map-side emission — a cell is owned by its
  * top-left pixel's tile, right/bottom corners come from the halo, so
  * no segment is emitted twice and no tile boundary is missed. Output
  * is bounded by the contour length, not the raster area.
  *
  * Exactness contract (what makes the DuckDB mirror hash-exact): with
  * integer-valued pixels and a .5 level, every interpolation
  * t = (level − z0)/(z1 − z0) is ONE correctly-rounded IEEE divide of
  * exact doubles, and endpoint coords are one exact add on top — no
  * trig, no accumulation order.
  */
object Contours {

  /** Segment endpoints per case, encoded as edge ids:
    * 0 = top (between z00 and z10), 1 = right (z10–z11),
    * 2 = bottom (z01–z11), 3 = left (z00–z01).
    * Corner-inside mask bits: 1 = z00 (TL), 2 = z10 (TR), 4 = z11 (BR),
    * 8 = z01 (BL). Saddles (5, 10) pick by center average.
    */
  private val SegTable: Array[Array[(Int, Int)]] = Array(
    /* 0 */ Array(),
    /* 1 */ Array((3, 0)),
    /* 2 */ Array((0, 1)),
    /* 3 */ Array((3, 1)),
    /* 4 */ Array((1, 2)),
    /* 5 */ Array(), // saddle — resolved inline
    /* 6 */ Array((0, 2)),
    /* 7 */ Array((3, 2)),
    /* 8 */ Array((3, 2)),
    /* 9 */ Array((0, 2)),
    /* 10 */ Array(), // saddle — resolved inline
    /* 11 */ Array((1, 2)),
    /* 12 */ Array((3, 1)),
    /* 13 */ Array((0, 1)),
    /* 14 */ Array((3, 0)),
    /* 15 */ Array())

  /** Contour segments at `level` over the tile grid. Output columns:
    * cell anchor (x, y) = the global top-left pixel of the 2×2 cell,
    * band, seg ordinal (0, and 1 for the saddle's second segment), and
    * the two endpoints (x0, y0)–(x1, y1) in pixel coordinates.
    */
  def contourSegments(tiles: Dataset[Tile], tileSize: Int,
                      level: Double): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    TileOps.convolvePad(tiles, 1).flatMap { case (t, pad, pw, _) =>
      val baseX = t.cellX * tileSize; val baseY = t.cellY * tileSize
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Int, Int, Double, Double, Double, Double)]
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val z00 = pad((r + 1) * pw + (c + 1))
          val z10 = pad((r + 1) * pw + (c + 2))
          val z01 = pad((r + 2) * pw + (c + 1))
          val z11 = pad((r + 2) * pw + (c + 2))
          // the cell exists only when all four corners are in-raster
          // (border tiles own no cells past the last column/row)
          if (!z10.isNaN && !z01.isNaN && !z11.isNaN && !z00.isNaN) {
            var mask = 0
            if (z00 > level) mask |= 1
            if (z10 > level) mask |= 2
            if (z11 > level) mask |= 4
            if (z01 > level) mask |= 8
            if (mask != 0 && mask != 15) {
              val gx = baseX + c; val gy = baseY + r
              // edge crossing points (only evaluated on crossed edges)
              def pt(edge: Int): (Double, Double) = edge match {
                case 0 => (gx + (level - z00) / (z10 - z00), gy.toDouble)
                case 1 => ((gx + 1).toDouble, gy + (level - z10) / (z11 - z10))
                case 2 => (gx + (level - z01) / (z11 - z01), (gy + 1).toDouble)
                case _ => (gx.toDouble, gy + (level - z00) / (z01 - z00))
              }
              val segs: Array[(Int, Int)] =
                if (mask == 5) {
                  if ((z00 + z10 + z01 + z11) / 4.0 > level)
                    Array((0, 1), (3, 2)) else Array((3, 0), (1, 2))
                } else if (mask == 10) {
                  if ((z00 + z10 + z01 + z11) / 4.0 > level)
                    Array((3, 0), (1, 2)) else Array((0, 1), (3, 2))
                } else SegTable(mask)
              var i = 0
              while (i < segs.length) {
                val (e0, e1) = segs(i)
                val (x0, y0) = pt(e0); val (x1, y1) = pt(e1)
                out += ((gx, gy, t.band, i, x0, y0, x1, y1))
                i += 1
              }
            }
          }
          c += 1
        }
        r += 1
      }
      out
    }.toDF("x", "y", "band", "seg", "x0", "y0", "x1", "y1")
  }
}
