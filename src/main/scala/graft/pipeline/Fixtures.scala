package graft.pipeline

import graft.geo.{BBox, Polygon}

/** Deterministic polygon fixture shared between the Spark queries and their
  * DuckDB oracles. Rectangles are expressed with short decimal literals so
  * both engines parse bit-identical doubles; the Spark side still runs the
  * generic winding-number PIP machinery (graft.geo.Polygon), not a bbox
  * shortcut. One rectangle sits on the hot-city cluster (Paris) to make the
  * join skewed like real web-page geography.
  */
object Fixtures {

  /** (poly_id, xMin, xMax, yMin, yMax) */
  val rects: Seq[(Long, Double, Double, Double, Double)] = Seq(
    (1L, 2.0, 3.0, 48.0, 49.5),      // Paris hotspot
    (2L, -180.0, -90.0, 0.0, 85.0),  // NW quarter-ish
    (3L, -90.0, 0.0, -85.0, 0.0),    // SW
    (4L, 0.0, 90.0, -85.0, 0.0),     // SE
    (5L, 90.0, 180.0, 0.0, 85.0),    // NE
    (6L, -10.5, 30.25, 35.0, 60.0),  // Europe-ish, overlaps 1
    (7L, 100.0, 150.0, 20.0, 50.0),  // East Asia, overlaps 5
    (8L, -120.0, -60.0, -30.0, 30.0),// Americas band, overlaps 3
    (9L, 139.0, 140.5, 35.0, 36.5),  // Tokyo hotspot
    (10L, -1.0, 1.0, -1.0, 1.0)      // null island
  )

  def polygons: Seq[(Long, Polygon)] =
    rects.map { case (id, x0, x1, y0, y1) => (id, Polygon.box(BBox(x0, x1, y0, y1))) }

  /** DuckDB VALUES clause: `(poly_id, x_min, x_max, y_min, y_max)`. */
  def sqlRectValues: String =
    rects.map { case (id, x0, x1, y0, y1) => s"($id, $x0, $x1, $y0, $y1)" }
      .mkString("(VALUES ", ", ", ") AS polys(poly_id, x_min, x_max, y_min, y_max)")
}
