package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.geo.{BBox, Polygon}
import graft.joins.{KnnJoin, SpatialJoins}
import graft.pipeline.{Fixtures, Pages}
import graft.tiles.{RasterSpec, TileOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.json.
  *
  * Every oracle-checked query is written so the Spark plan and the DuckDB
  * SQL perform the SAME IEEE operations in the SAME order on every row:
  * integer (micro-degree) LCG geocoding, one shared division to doubles,
  * mirrored floor/cell arithmetic. Aggregates that must be exact use
  * integer/count math, never order-dependent double sums.
  */
object SparkEntry {

  /** Flagship: geocode pages by url hash (Catalyst expression), assign hex
    * cells at res 7, count pages per cell. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftFunctions.register(spark)
    val pages = Pages.pages(spark, "/root/testdata/sf0.001")
    pages
      .withColumn("geo", GraftFunctions.geocodeUrl(col("url")))
      .withColumn("h3", GraftFunctions.h3Cell(col("geo.lon"), col("geo.lat"), lit(7)))
      .groupBy(col("h3")).agg(count(lit(1)).as("n_pages"), min(col("doc_id")).as("min_doc"))
  }

  /** Deterministic synthetic raster shared with the DuckDB range() oracles:
    * 256×256, 2 bands, quarter-degree pixels, origin (0, 64), tile 64 —
    * v(x,y,b) = (x*7 + y*13 + b*5) % 97. All grid math lands on exact
    * binary fractions so center-in tests can never straddle an FP tie.
    */
  val rasterSpec: RasterSpec =
    RasterSpec(0.0, 64.0, 0.25, -0.25, 256, 256, 64, 2)
  private def rasterValue(x: Int, y: Int, b: Int): Double =
    ((x * 7 + y * 13 + b * 5) % 97).toDouble
  private val sqlPx =
    """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
         CAST(b AS INTEGER) AS band,
         CAST((x*7 + y*13 + b*5) % 97 AS DOUBLE) AS v,
         0.0 + (x + 0.5) * 0.25 AS gx, 64.0 + (y + 0.5) * -0.25 AS gy
       FROM range(256) r1(x), range(256) r2(y), range(2) r3(b))"""
  private val clipRect = BBox(10.5, 40.25, 20.0, 50.5)
  /** (zone_id, xMin, xMax, yMin, yMax) in raster geo coords. */
  private val zoneRects: Seq[(Long, Double, Double, Double, Double)] = Seq(
    (1L, 0.0, 16.0, 48.0, 64.0), (2L, 16.0, 48.0, 16.0, 48.0),
    (3L, 48.0, 64.0, 0.0, 16.0), (4L, 8.25, 55.75, 30.5, 33.25),
    (5L, 62.0, 70.0, 60.0, 70.0)) // partially outside the raster
  private def zonePolys = zoneRects.map { case (id, x0, x1, y0, y1) =>
    (id, Polygon.box(BBox(x0, x1, y0, y1))) }
  private val sqlZones = zoneRects
    .map { case (id, x0, x1, y0, y1) => s"($id, $x0, $x1, $y0, $y1)" }
    .mkString("(VALUES ", ", ", ") AS zones(zone, zx0, zx1, zy0, zy1)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- geocoding + tiling (the north-rule spine) ---
    "geo_geocode" -> { (s, dir) =>
      Pages.pages(s, dir).select("doc_id", "lon_udeg", "lat_udeg", "lon", "lat")
    },

    "geo_cells" -> { (s, dir) =>
      GraftFunctions.register(s)
      val p = Pages.pages(s, dir)
      val c7 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(Pages.TileLevel))
      val c12 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(Pages.FineLevel))
      p.select(col("doc_id"),
        GraftFunctions.gridX(c7).as("cell_x7"), GraftFunctions.gridY(c7).as("cell_y7"),
        GraftFunctions.gridX(c12).as("cell_x12"), GraftFunctions.gridY(c12).as("cell_y12"))
    },

    "geo_cell_counts" -> { (s, dir) =>
      GraftFunctions.register(s)
      val p = Pages.pages(s, dir)
      val c7 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(Pages.TileLevel))
      p.select(col("doc_id"),
          (GraftFunctions.gridX(c7) * 128 + GraftFunctions.gridY(c7)).as("cell_key"))
        .groupBy("cell_key")
        .agg(count(lit(1)).as("n_pages"), min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    },

    "geo_utm" -> { (s, dir) =>
      GraftFunctions.register(s)
      Pages.pages(s, dir)
        .select(col("doc_id"), GraftFunctions.utmEpsg(col("lat"), col("lon")).as("epsg"))
    },

    "geo_pip" -> { (s, dir) =>
      val p = Pages.pages(s, dir).select("doc_id", "lon", "lat")
      SpatialJoins.pipJoinBroadcast(p, Fixtures.polygons, "lon", "lat")
        .groupBy("poly_id")
        .agg(count(lit(1)).as("n_pages"), min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    },

    "geo_pip_anti" -> { (s, dir) =>
      val p = Pages.pages(s, dir).select("doc_id", "lon", "lat")
      SpatialJoins.pipSemiJoin(p, Fixtures.polygons, "lon", "lat", invert = true)
        .select("doc_id")
    },

    "geo_knn" -> { (s, dir) =>
      val pts = Pages.pages(s, dir)
        .select(col("doc_id").as("id"), col("lon_udeg").as("x"), col("lat_udeg").as("y"))
      val probes = pts.filter(col("id") < 100)
      KnnJoin.knnBroadcastProbes(pts, probes, k = 3)
    },

    "geo_align_bbox" -> { (s, dir) =>
      GraftFunctions.register(s)
      // per-doc target bbox on a 0.25 lattice (exact binary fractions),
      // snapped to the unit grid anchored at (0, 100).
      val p = Pages.pages(s, dir)
        .withColumn("tx0", (col("doc_id") % 89) * lit(0.25) - lit(10.0))
        .withColumn("tx1", col("tx0") + (col("doc_id") % 13 + 1) * lit(0.25))
        .withColumn("ty0", (col("doc_id") % 71) * lit(0.25) - lit(8.0))
        .withColumn("ty1", col("ty0") + (col("doc_id") % 7 + 1) * lit(0.25))
      val a = GraftFunctions.alignBBox(lit(0.0), lit(100.0),
        col("tx0"), col("tx1"), col("ty0"), col("ty1"), lit(1.0), lit(-1.0))
      p.select(col("doc_id"), a.getField("x_min").as("ax0"), a.getField("x_max").as("ax1"),
        a.getField("y_min").as("ay0"), a.getField("y_max").as("ay1"))
    },

    "geo_pixel_offsets" -> { (s, dir) =>
      GraftFunctions.register(s)
      val p = Pages.pages(s, dir)
        .withColumn("tx0", (col("doc_id") % 89) * lit(0.25) - lit(10.0))
        .withColumn("tx1", col("tx0") + (col("doc_id") % 13 + 1) * lit(0.25))
        .withColumn("ty0", (col("doc_id") % 71) * lit(0.25) - lit(8.0))
        .withColumn("ty1", col("ty0") + (col("doc_id") % 7 + 1) * lit(0.25))
      val o = GraftFunctions.pixelOffsets(lit(-16.0), lit(0.25), lit(32.0), lit(-0.25),
        col("tx0"), col("tx1"), col("ty0"), col("ty1"))
      p.select(col("doc_id"), o.getField("x_start").as("x_start"),
        o.getField("y_start").as("y_start"), o.getField("x_size").as("x_size"),
        o.getField("y_size").as("y_size"))
    },

    // --- raster / tile engine (buteo clip/resample/zonal/convolve parity) ---
    "raster_tile_stats" -> { (s, _) =>
      TileOps.tileStats(TileOps.createRaster(s, rasterSpec)(rasterValue))
    },

    "raster_resample" -> { (s, _) =>
      val down = TileOps.resampleNearest(TileOps.createRaster(s, rasterSpec)(rasterValue), 4)
      TileOps.toPixels(down, rasterSpec.tileSize / 4)
    },

    "raster_clip" -> { (s, _) =>
      val clipped = TileOps.clip(TileOps.createRaster(s, rasterSpec)(rasterValue),
        Polygon.box(clipRect))
      TileOps.tileStats(clipped).filter(col("n_px") > 0)
    },

    "raster_zonal" -> { (s, _) =>
      TileOps.zonalStats(TileOps.createRaster(s, rasterSpec)(rasterValue), zonePolys)
    },

    "raster_convolve_sum" -> { (s, _) =>
      val conv = TileOps.convolve(TileOps.createRaster(s, rasterSpec)(rasterValue),
        radius = 1, method = "sum")
      TileOps.toPixels(conv, rasterSpec.tileSize)
    },

    "raster_convolve_median" -> { (s, _) =>
      val conv = TileOps.convolve(TileOps.createRaster(s, rasterSpec)(rasterValue),
        radius = 1, method = "median")
      TileOps.toPixels(conv, rasterSpec.tileSize)
    }
  )

  /** SQL snippets shared by the bbox-lattice oracle queries. */
  private val sqlTargetBBox =
    """, tgt AS (SELECT doc_id,
         (doc_id % 89) * 0.25 - 10.0 AS tx0,
         (doc_id % 89) * 0.25 - 10.0 + (doc_id % 13 + 1) * 0.25 AS tx1,
         (doc_id % 71) * 0.25 - 8.0 AS ty0,
         (doc_id % 71) * 0.25 - 8.0 + (doc_id % 7 + 1) * 0.25 AS ty1
       FROM pages)"""

  def oracleSql: Map[String, String] = Map(
    "geo_geocode" -> Pages.sqlWith(
      "SELECT doc_id, lon_udeg, lat_udeg, lon, lat FROM pages"),

    "geo_cells" -> Pages.sqlWith(
      s"""SELECT doc_id,
          ${Pages.sqlCellX(Pages.TileLevel)} AS cell_x7,
          ${Pages.sqlCellY(Pages.TileLevel)} AS cell_y7,
          ${Pages.sqlCellX(Pages.FineLevel)} AS cell_x12,
          ${Pages.sqlCellY(Pages.FineLevel)} AS cell_y12
        FROM pages"""),

    "geo_cell_counts" -> Pages.sqlWith(
      s"""SELECT ${Pages.sqlCellX(Pages.TileLevel)} * 128 + ${Pages.sqlCellY(Pages.TileLevel)} AS cell_key,
          count(*) AS n_pages, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM pages GROUP BY 1"""),

    "geo_utm" -> Pages.sqlWith(
      """SELECT doc_id,
          CAST(32000 + (CASE WHEN lat < 0 THEN 700 ELSE 600 END)
               + CAST(floor((lon + 180.0) / 6.0 + 1.0) AS INTEGER) AS INTEGER) AS epsg
        FROM pages"""),

    "geo_pip" -> Pages.sqlWith(
      s"""SELECT CAST(poly_id AS BIGINT) AS poly_id, count(*) AS n_pages,
          min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM pages JOIN ${Fixtures.sqlRectValues}
          ON lon >= x_min AND lon <= x_max AND lat >= y_min AND lat <= y_max
        GROUP BY 1"""),

    "geo_pip_anti" -> Pages.sqlWith(
      s"""SELECT doc_id FROM pages p WHERE NOT EXISTS (
          SELECT 1 FROM ${Fixtures.sqlRectValues}
          WHERE p.lon >= x_min AND p.lon <= x_max AND p.lat >= y_min AND p.lat <= y_max)"""),

    "geo_knn" -> Pages.sqlWith(
      """SELECT query_id, neighbor_id, dist2, CAST(rank AS INTEGER) AS rank FROM (
          SELECT p.doc_id AS query_id, t.doc_id AS neighbor_id,
            (p.lon_udeg - t.lon_udeg) * (p.lon_udeg - t.lon_udeg)
              + (p.lat_udeg - t.lat_udeg) * (p.lat_udeg - t.lat_udeg) AS dist2,
            row_number() OVER (PARTITION BY p.doc_id ORDER BY
              (p.lon_udeg - t.lon_udeg) * (p.lon_udeg - t.lon_udeg)
                + (p.lat_udeg - t.lat_udeg) * (p.lat_udeg - t.lat_udeg), t.doc_id) AS rank
          FROM pages p JOIN pages t ON t.doc_id <> p.doc_id
          WHERE p.doc_id < 100) WHERE rank <= 3"""),

    "geo_align_bbox" -> Pages.sqlWith(sqlTargetBBox +
      """ SELECT doc_id,
          0.0 + floor((tx0 - 0.0) / 1.0) * 1.0 AS ax0,
          0.0 + ceil((tx1 - 0.0) / 1.0) * 1.0 AS ax1,
          100.0 + ceil((ty0 - 100.0) / -1.0) * -1.0 AS ay0,
          100.0 + floor((ty1 - 100.0) / -1.0) * -1.0 AS ay1
        FROM tgt"""),

    "geo_pixel_offsets" -> Pages.sqlWith(sqlTargetBBox +
      """ SELECT doc_id,
          CAST(round((tx0 - -16.0) / 0.25) AS INTEGER) AS x_start,
          CAST(round((ty1 - 32.0) / -0.25) AS INTEGER) AS y_start,
          CAST(abs(round((tx1 - tx0) / 0.25)) AS INTEGER) AS x_size,
          CAST(abs(round((ty0 - ty1) / -0.25)) AS INTEGER) AS y_size
        FROM tgt"""),

    "raster_tile_stats" -> (sqlPx +
      """ SELECT CAST(x // 64 AS INTEGER) AS cell_x, CAST(y // 64 AS INTEGER) AS cell_y,
          band, min(v) AS vmin, max(v) AS vmax,
          CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS vsum, CAST(count(*) AS BIGINT) AS n_px
        FROM px GROUP BY 1, 2, 3"""),

    "raster_resample" -> (sqlPx +
      """ SELECT CAST(x // 4 AS INTEGER) AS x, CAST(y // 4 AS INTEGER) AS y, band, v
        FROM px WHERE x % 4 = 2 AND y % 4 = 2"""),

    "raster_clip" -> (sqlPx +
      """ SELECT CAST(x // 64 AS INTEGER) AS cell_x, CAST(y // 64 AS INTEGER) AS cell_y,
          band, min(v) AS vmin, max(v) AS vmax,
          CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS vsum, CAST(count(*) AS BIGINT) AS n_px
        FROM px
        WHERE gx >= 10.5 AND gx <= 40.25 AND gy >= 20.0 AND gy <= 50.5
        GROUP BY 1, 2, 3"""),

    "raster_zonal" -> (sqlPx +
      s""" SELECT CAST(zone AS BIGINT) AS zone, band, CAST(count(*) AS BIGINT) AS n_px,
          CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS vsum, min(v) AS vmin, max(v) AS vmax
        FROM px JOIN $sqlZones
          ON gx >= zx0 AND gx <= zx1 AND gy >= zy0 AND gy <= zy1
        GROUP BY 1, 2"""),

    "raster_convolve_sum" -> (sqlPx +
      """ SELECT a.x, a.y, a.band, sum(b.v) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_convolve_median" -> (sqlPx +
      """ SELECT a.x, a.y, a.band, median(b.v) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3""")
  )
}
