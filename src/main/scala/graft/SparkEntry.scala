package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.geo.{BBox, Polygon}
import graft.index.Geohash
import graft.joins.{AsofJoin, KnnJoin, RangeJoin, SpatialJoins}
import graft.ops.{CellSets, Dedup, Events, LineOps, Quality, Relational, Similarity, Sketches, SpatialStats, TextOps, WebOps}
import graft.pipeline.{Fixtures, Pages}
import graft.tiles.{Contours, CostDist, Flow, PatchGrid, RasterSpec, TileOps, TileOps2}

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

  /** Small plane for the WINDOW-family oracles (convolve/morphology/
    * distance/fill): same generator on 96×96×2, tile 32 — a 3×3 tile
    * grid per band still exercises cross-tile halos in both dims, while
    * the DuckDB neighbor-join oracle drops from 30-60 s to ~1 s per
    * query. The 256-plane versions of these 24 oracles cost the driver
    * gate ~15 min of DuckDB alone and blew the round-2 budget
    * (VERDICT r2 §What's wrong #1 — CORRECTNESS_r02.json = `{}`).
    */
  val convSpec: RasterSpec =
    RasterSpec(0.0, 64.0, 0.25, -0.25, 96, 96, 32, 2)
  private val sqlPxConv =
    """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
         CAST(b AS INTEGER) AS band,
         CAST((x*7 + y*13 + b*5) % 97 AS DOUBLE) AS v,
         0.0 + (x + 0.5) * 0.25 AS gx, 64.0 + (y + 0.5) * -0.25 AS gy
       FROM range(96) r1(x), range(96) r2(y), range(2) r3(b))"""
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

  /** Zones for the AREA-WEIGHTED zonal query: sixteenth-aligned edges
    * (multiples of 0.0625 = the cell area quantum) sit strictly INSIDE
    * pixel cells, so boundary fractions ∈ {1/4, 1/2, 3/4} per axis are
    * live everywhere — and every fraction/product/partial sum stays an
    * exact binary fraction (order-independent FP ⇒ hash-exact oracle).
    */
  private val wzoneRects: Seq[(Long, Double, Double, Double, Double)] = Seq(
    (1L, 0.0625, 16.1875, 48.0625, 63.8125),
    (2L, 16.3125, 47.9375, 16.1875, 47.8125),
    (3L, 48.0625, 63.8125, 0.1875, 15.9375),
    (4L, 8.3125, 55.6875, 30.5625, 33.1875),
    (5L, 61.9375, 70.0, 59.8125, 70.0)) // partially outside the raster
  private def wzonePolys = wzoneRects.map { case (id, x0, x1, y0, y1) =>
    (id, Polygon.box(BBox(x0, x1, y0, y1))) }
  private val sqlWZones = wzoneRects
    .map { case (id, x0, x1, y0, y1) => s"($id, $x0, $x1, $y0, $y1)" }
    .mkString("(VALUES ", ", ", ") AS zones(zone, zx0, zx1, zy0, zy1)")

  /** Shared oracle CTEs for the text/dedup family. */
  /** SQL mirror of [[anchorFixture]] plus the two-group anchor regex —
    * shared by the web_anchors / web_anchor_terms oracles.
    */
  private val sqlAnchorFixture =
    """WITH h AS (SELECT doc_id,
         '<!DOCTYPE html><html><head><title>t</title></head><body><p>' || text || '</p>' ||
         CASE WHEN doc_id % 11 = 0 THEN '' ELSE
           '<a class="nav" href="https://host' ||
           CAST((doc_id * 31 + 7) % 97 AS VARCHAR) || '.example/">' ||
           CASE WHEN doc_id % 4 = 0 THEN 'home page'
                WHEN doc_id % 4 = 1 THEN 'latest news'
                WHEN doc_id % 4 = 2 THEN 'about us' ELSE 'home' END ||
           '</a><img src="skip.png"/><a href="https://host' ||
           CAST((doc_id * 17 + 3) % 97 AS VARCHAR) || '.example/about">' ||
           CASE WHEN doc_id % 3 = 0 THEN 'click here'
                WHEN doc_id % 3 = 1 THEN 'read more' ELSE 'home' END ||
           '</a>' END || '</body></html>' AS html
         FROM documents),
       x AS (SELECT doc_id,
         regexp_extract_all(html, '<a[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 1) AS hrefs,
         regexp_extract_all(html, '<a[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 2) AS texts
         FROM h)"""

  private val sqlToks =
    """WITH toks AS (SELECT doc_id, tok FROM
         (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         WHERE tok <> ''),
       dtoks AS (SELECT DISTINCT doc_id, tok FROM toks),
       sizes AS (SELECT doc_id, count(*) AS n_toks FROM dtoks GROUP BY doc_id)"""

  /** Eight world-city anchors for the nearest-anchor (reverse-geocode)
    * query — coordinates live as STRINGS so the Scala side (toDouble)
    * and the SQL side (CAST('…' AS DOUBLE)) parse identical bits.
    */
  private object AnchorFixture {
    val raw: Seq[(Long, String, String)] = Seq(
      (0L, "-74.0", "40.7"), (1L, "2.35", "48.85"), (2L, "139.7", "35.7"),
      (3L, "151.2", "-33.9"), (4L, "-0.1", "51.5"), (5L, "77.2", "28.6"),
      (6L, "-46.6", "-23.5"), (7L, "31.2", "30.0"))
    def rows: Seq[(Long, Double, Double)] =
      raw.map { case (id, lo, la) => (id, lo.toDouble, la.toDouble) }
    def sqlValues: String = raw.map { case (id, lo, la) =>
      s"($id, CAST('$lo' AS DOUBLE), CAST('$la' AS DOUBLE))" }.mkString(", ")
  }

  /** Bit-identical float constant for a SQL mirror: Scala's Double
    * toString round-trips exactly and DuckDB's string→DOUBLE parse is
    * correctly rounded, so both engines hold the same bits (a bare SQL
    * decimal literal would parse as DECIMAL — the raster_reproject
    * lesson).
    */
  private def sqlDouble(v: Double): String = s"CAST('$v' AS DOUBLE)"

  private def sqlMinhashSig(k: Int): String = {
    // top 60 bits of md5('$i:'||tok) as BIGINT — Dedup's md5prefix family
    val mins = (1 to k).map(i =>
      s"min(CAST('0x' || substr(md5('$i:' || tok), 1, 15) AS BIGINT)) AS s$i")
      .mkString(", ")
    s"sig AS (SELECT doc_id, $mins FROM dtoks GROUP BY doc_id)"
  }

  /** Deterministic vector fixture: 200 rectangles on an integer lattice,
    * WKT built by string concat (so the WKT parser is exercised on the
    * Spark side while the oracle reproduces the arithmetic directly).
    */
  private def vectorFeatures(s: SparkSession): DataFrame = {
    val f = s.range(200).select(
      col("id").as("fid"),
      concat(lit("c"), (col("id") % 5).cast("string")).as("klass"),
      ((col("id") % 20) * 4).cast("int").as("x0"),
      ((col("id") / 20).cast("long") * 5).cast("int").as("y0"),
      (col("id") % 3 + 1).cast("int").as("w"),
      (col("id") % 4 + 1).cast("int").as("h"))
    f.withColumn("wkt", rectWkt(col("x0"), col("y0"), col("w"), col("h")))
  }

  /** Non-convex fixture for the shape-characteristics op: 200 L-shaped
    * hexagons (axis-aligned rect minus a top-right notch) on an integer
    * lattice — every metric has a closed form the DuckDB oracle derives
    * INDEPENDENTLY from the same integer parameters (the engine parses
    * the WKT and runs the general shoelace/monotone-chain algorithms).
    */
  private def vectorLShapes(s: SparkSession): DataFrame = {
    val f = s.range(200).select(
      col("id").as("fid"),
      ((col("id") % 20) * 8).cast("int").as("x0"),
      ((col("id") / 20).cast("long") * 10).cast("int").as("y0"),
      (col("id") % 4 + 2).cast("int").as("w"),
      (col("id") % 6 + 2).cast("int").as("h"))
      .withColumn("nw", (lit(1) + col("fid") % (col("w") - 1)).cast("int"))
      .withColumn("nh", (lit(1) + col("fid") % (col("h") - 1)).cast("int"))
    // CCW: (x0,y0) (x1,y0) (x1,y1-nh) (x1-nw,y1-nh) (x1-nw,y1) (x0,y1)
    val x1 = col("x0") + col("w"); val y1 = col("y0") + col("h")
    f.withColumn("wkt", concat(
      lit("POLYGON (("),
      col("x0"), lit(" "), col("y0"), lit(", "),
      x1, lit(" "), col("y0"), lit(", "),
      x1, lit(" "), y1 - col("nh"), lit(", "),
      x1 - col("nw"), lit(" "), y1 - col("nh"), lit(", "),
      x1 - col("nw"), lit(" "), y1, lit(", "),
      col("x0"), lit(" "), y1, lit(", "),
      col("x0"), lit(" "), col("y0"), lit("))")))
  }

  private def vectorQueries(s: SparkSession): DataFrame = {
    val q = s.range(10).select(
      col("id").as("qid"),
      (col("id") * 8).cast("int").as("x0"),
      (col("id") * 4).cast("int").as("y0"),
      lit(6).as("w"), lit(7).as("h"))
    q.withColumn("wkt", rectWkt(col("x0"), col("y0"), col("w"), col("h")))
  }

  private def vectorMulti(s: SparkSession): DataFrame =
    s.range(50).select(col("id").as("fid"),
      when(col("id") % 2 === 0,
        concat(lit("MULTIPOLYGON((("),
          rectRing((col("id") % 20) * 4, col("id") * 2, lit(2), lit(2)), lit(")))")))
        .otherwise(
          concat(lit("MULTIPOLYGON((("),
            rectRing((col("id") % 20) * 4, col("id") * 2, lit(2), lit(2)),
            lit(")),(("),
            rectRing((col("id") % 20) * 4 + 100, col("id") * 2, lit(3), lit(1)),
            lit(")))"))).as("wkt"))

  private def rectRing(x0: org.apache.spark.sql.Column, y0: org.apache.spark.sql.Column,
                       w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) = {
    val x1 = (x0 + w).cast("string"); val y1 = (y0 + h).cast("string")
    val xs = x0.cast("string"); val ys = y0.cast("string")
    concat(xs, lit(" "), ys, lit(", "), x1, lit(" "), ys, lit(", "),
      x1, lit(" "), y1, lit(", "), xs, lit(" "), y1, lit(", "), xs, lit(" "), ys)
  }

  private def rectWkt(x0: org.apache.spark.sql.Column, y0: org.apache.spark.sql.Column,
                      w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
    concat(lit("POLYGON(("), rectRing(x0, y0, w, h), lit("))"))

  /** Shared oracle CTEs for the vector fixture. */
  private val sqlFeats =
    """feats AS (SELECT id AS fid, 'c' || CAST(id % 5 AS VARCHAR) AS klass,
         CAST((id % 20) * 4 AS INTEGER) AS x0, CAST((id // 20) * 5 AS INTEGER) AS y0,
         CAST(id % 3 + 1 AS INTEGER) AS w, CAST(id % 4 + 1 AS INTEGER) AS h
       FROM range(200) t(id))"""
  private val sqlQueries =
    """qs AS (SELECT id AS qid, CAST(id * 8 AS INTEGER) AS x0,
         CAST(id * 4 AS INTEGER) AS y0, 6 AS w, 7 AS h FROM range(10) t(id))"""

  /** feats + reconstructed WKT (exact string mirror of rectWkt). */
  private val sqlFeatWkt =
    """, fw AS (SELECT fid, x0, y0, w, h,
         'POLYGON((' || x0 || ' ' || y0 || ', ' || (x0 + w) || ' ' || y0 || ', '
           || (x0 + w) || ' ' || (y0 + h) || ', ' || x0 || ' ' || (y0 + h) || ', '
           || x0 || ' ' || y0 || '))' AS wkt
       FROM feats)"""

  /** Second deterministic plane for mixup/cutmix sources. */
  private def mixValue(x: Int, y: Int, b: Int): Double =
    ((x * 3 + y * 11 + b * 7) % 89).toDouble
  private val sqlMixV = "CAST((x*3 + y*11 + band*7) % 89 AS DOUBLE)"

  /** Clip layer for vector_clip (id, xMin, xMax, yMin, yMax). */
  private val clipZoneRects: Seq[(Long, Double, Double, Double, Double)] = Seq(
    (1L, 0.0, 30.0, 0.0, 20.0), (2L, 20.0, 60.0, 10.0, 40.0),
    (3L, 50.0, 82.0, 30.0, 50.0))
  private def clipZones = clipZoneRects.map { case (id, x0, x1, y0, y1) =>
    (id, Polygon.box(BBox(x0, x1, y0, y1))) }
  private val sqlClipZones = clipZoneRects
    .map { case (id, x0, x1, y0, y1) => s"($id, $x0, $x1, $y0, $y1)" }
    .mkString("(VALUES ", ", ", ") AS c(cid, cx0, cx1, cy0, cy1)")

  /** SQL mirror of Augment.u01 (same integer ops, same order). */
  private def u01Sql(seed: Long, a: String, b: String, c: String): String =
    graft.tiles.Augment.u01Sql(seed, a, b, c)

  /** SQL mirror of S2Cell.encode at `level` (graft.index.S2Cell): trig →
    * dominant-axis face → UV quotient → quadratic ST → floor/clamp →
    * bit interleave → packed id. DuckDB errors on overflowing `<<`, so
    * the f≥4 top bits are assembled by explicit signed arithmetic from
    * Long.MinValue (disjoint bit ranges ⟹ `|` ≡ `+`). Emits CTE text; the
    * caller supplies `pages(lon, lat)`.
    */
  private def sqlS2Cell(level: Int): String = {
    val n = 1L << level
    def inter(col: String): String =
      (0 until level).map(b => s"(($col // ${1L << b}) % 2) * ${1L << (2 * b)}")
        .mkString("(", " + ", ")")
    s"""s2xyz AS (SELECT doc_id,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
       FROM pages),
     s2face AS (SELECT doc_id, x, y, z,
         CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z)
                THEN CASE WHEN x >= 0 THEN 0 ELSE 3 END
              WHEN abs(y) >= abs(z) THEN CASE WHEN y >= 0 THEN 1 ELSE 4 END
              ELSE CASE WHEN z >= 0 THEN 2 ELSE 5 END END AS f
       FROM s2xyz),
     s2uv AS (SELECT doc_id, f,
         CASE f WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
         CASE f WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
       FROM s2face),
     s2ij AS (SELECT doc_id, f,
         LEAST(${n - 1}, GREATEST(0, CAST(FLOOR(
           (CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u)
                 ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END) * $n.0) AS BIGINT))) AS i,
         LEAST(${n - 1}, GREATEST(0, CAST(FLOOR(
           (CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * v)
                 ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END) * $n.0) AS BIGINT))) AS j
       FROM s2uv),
     s2cell AS (SELECT doc_id,
         CASE WHEN f >= 4
           THEN (-9223372036854775807 - 1) + CAST(f - 4 AS BIGINT) * 2305843009213693952
                + ${level.toLong << 56} + ${inter("i")} + 2 * ${inter("j")}
           ELSE CAST(f AS BIGINT) * 2305843009213693952
                + ${level.toLong << 56} + ${inter("i")} + 2 * ${inter("j")} END AS s2
       FROM s2ij)"""
  }

  /** DuckDB-SQL mirrors of the GridCell packed-id bit layout (level<<58 +
    * morton(x, y)) for the compact/uncompact oracles: [[sqlGridId]] packs
    * an (x, y) pair already in scope (bit interleave as quotient sums, the
    * sqlS2Cell technique), [[sqlGridParent]] is CellSets.cellParent as
    * pure integer quotient arithmetic, and [[sqlVals16]] enumerates the
    * 16 level+2 Morton suffixes of one cell.
    */
  private def sqlGridId(level: Int, x: String, y: String): String = {
    def inter(c: String): String =
      (0 until level).map(b => s"(($c // ${1L << b}) % 2) * ${1L << (2 * b)}")
        .mkString("(", " + ", ")")
    s"(${level.toLong << 58} + ${inter(x)} + 2 * ${inter(y)})"
  }
  private def sqlGridParent(c: String): String =
    s"((($c // ${1L << 58}) - 1) * ${1L << 58} + ($c % ${1L << 58}) // 4)"
  private val sqlVals16: String =
    (0 to 15).map(t => s"($t)").mkString("(VALUES ", ", ", ") AS ts(t)")

  /** Shared CTE block of the cosineDupPairs mirror: quantize → hyperplane
    * bits → band keys → capped candidates → exact integer dot/self-dots →
    * `epairs(vec_a, vec_b, dot, cos)` filtered at cos ≥ 0.3. Used by the
    * emb_dup_pairs oracle directly and closed transitively by
    * emb_clusters.
    */
  private val sqlEmbPairCtes: String =
    """q AS (SELECT vec_id, d,
           CAST(ROUND(CAST(embedding[d + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS qv
         FROM embeddings, range(64) t(d)),
        bits AS (SELECT vec_id, p,
          CASE WHEN CAST(SUM(CASE WHEN CAST(FLOOR((d * 2654435761 + p * 40503 + 11) / 65536.0) AS BIGINT) % 2 = 0
                         THEN qv ELSE -qv END) AS BIGINT) > 0
               THEN 1 ELSE 0 END AS bit
         FROM q, range(16) pp(p) GROUP BY vec_id, p),
        bkeys AS (SELECT vec_id, p // 8 AS band,
          CAST(SUM(bit * (1::BIGINT << (p % 8))) AS BIGINT) AS key
         FROM bits GROUP BY vec_id, p // 8),
        idx AS (SELECT vec_id, band, key,
          row_number() OVER (PARTITION BY band, key ORDER BY vec_id) AS rn
         FROM bkeys),
        cand AS (SELECT DISTINCT least(a.vec_id, b.vec_id) AS vec_a,
                   greatest(a.vec_id, b.vec_id) AS vec_b
         FROM bkeys a JOIN idx b
           ON a.band = b.band AND a.key = b.key
           AND a.vec_id <> b.vec_id AND b.rn <= 128),
        norms AS (SELECT vec_id, CAST(SUM(qv * qv) AS BIGINT) AS nq FROM q GROUP BY vec_id),
        scored AS (SELECT c.vec_a, c.vec_b, CAST(SUM(qa.qv * qb.qv) AS BIGINT) AS dot
         FROM cand c
           JOIN q qa ON qa.vec_id = c.vec_a
           JOIN q qb ON qb.vec_id = c.vec_b AND qb.d = qa.d
         GROUP BY 1, 2),
        epairs AS (SELECT vec_a, vec_b, dot, cos FROM (
          SELECT s.vec_a, s.vec_b, s.dot,
            CAST(s.dot AS DOUBLE) / (sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE))) AS cos
          FROM scored s JOIN norms na ON na.vec_id = s.vec_a
            JOIN norms nb ON nb.vec_id = s.vec_b) t
         WHERE cos >= 0.3)"""

  /** DuckDB twin of [[graft.index.Hilbert.xy2d]]: the per-level
    * rotate/reflect walk unrolled as CTEs hb1..hb$level over an input CTE
    * `hb0(doc_id, x, y, d)`; the result lives in `hb$level.d`.
    */
  private def sqlHilbert(level: Int): String =
    (1 to level).map { k =>
      val s = 1L << (level - k)
      s"""hb$k AS (SELECT doc_id,
            CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END)
                 ELSE x END AS x,
            CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END)
                 ELSE y END AS y,
            d + ${s * s} * xor(3 * rx, ry) AS d
          FROM (SELECT doc_id, x, y, d,
                  CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
                  CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
                FROM hb${k - 1}) t)"""
    }.mkString(",\n        ")

  /** DuckDB twin of [[graft.index.Geohash.encodeCol]] (even precision):
    * a CTE chain ending in `gh(doc_id, gh$p)` — the same axis floors,
    * magic-mask bit spreads, interleave, and base-32 chars, op for op.
    */
  private def sqlGeohash(p: Int): String = {
    require(5 * p % 2 == 0, s"sqlGeohash: even precision only, got $p")
    val n = 1L << (5 * p / 2)
    val masks = Seq(
      (16, 0x0000ffff0000ffffL), (8, 0x00ff00ff00ff00ffL),
      (4, 0x0f0f0f0f0f0f0f0fL), (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    val steps = masks.zipWithIndex.map { case ((sh, m), i) =>
      s"gh${i + 1} AS (SELECT doc_id, ((gx | (gx << $sh)) & $m) AS gx, " +
        s"((gy | (gy << $sh)) & $m) AS gy FROM gh$i)"
    }.mkString(",\n          ")
    val chars = (0 until p).map { i =>
      s"substr('${Geohash.Alphabet}', CAST(((z >> ${5 * (p - 1 - i)}) & 31) AS INT) + 1, 1)"
    }.mkString(" || ")
    s"""gh0 AS (SELECT doc_id,
          CAST(LEAST(GREATEST(floor((lon + 180.0) / 360.0 * $n.0), 0), ${n - 1}) AS BIGINT) AS gx,
          CAST(LEAST(GREATEST(floor((lat + 90.0) / 180.0 * $n.0), 0), ${n - 1}) AS BIGINT) AS gy
        FROM pages),
        $steps,
        ghz AS (SELECT doc_id, ((gx << 1) | gy) AS z FROM gh${masks.size}),
        gh AS (SELECT doc_id, $chars AS gh$p FROM ghz)"""
  }

  /** S2 twins (S2Cell layout: face in bits 61..63 — the sign bit
    * participates, so the field ops are bitwise & / arithmetic >> rather
    * than quotients, verified two's-complement-identical in DuckDB).
    */
  private val s2FaceMask = 0xe000000000000000L
  private val s2MortonMask = 0x00ffffffffffffffL
  private def sqlS2Lvl(c: String): String = s"((($c) >> 56) & 31)"
  private def sqlS2ParentN(c: String, n: Int): String =
    s"((($c) & $s2FaceMask) + (${sqlS2Lvl(c)} - $n) * ${1L << 56} " +
      s"+ ((($c) & $s2MortonMask) // ${1L << (2 * n)}))"

  /** Polyline point-table fixture for the LineOps queries: 12 lines of 7
    * vertices whose deltas are Pythagorean (or axis) vectors, so every
    * segment length is an exact FP integer — prefix sums of lengths are
    * then order-independent and the oracles hash-exact.
    */
  private val lineDeltas: Array[(Int, Int)] = Array(
    (3, 4), (6, -8), (-5, 12), (8, 15), (-7, -24), (20, -21), (0, 9), (11, 0))
  private def lineFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    val rows = for (fid <- 0 until 12; k <- 0 to 6) yield {
      var x = fid * 3; var y = fid * 5
      for (j <- 1 to k) {
        val (dx, dy) = lineDeltas((fid * 7 + j * 5 + 3) % 8)
        x += dx; y += dy
      }
      (fid.toLong, k, x.toDouble, y.toDouble)
    }
    rows.toDF("fid", "seq", "x", "y")
  }
  /** Closed-form octile cost field for the wall-and-gap fixture, shared
    * by the costdist and backlink oracles: per passable cell the exact
    * integer (cs, cd) move counts of the minimum-cost path (direct when
    * source and cell share a side of the x=128 wall, else through the
    * (128,200) gap), argmin by value then counts.
    */
  private val sqlCostBest =
    """cells AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
         FROM range(256) r1(x), range(256) r2(y)
         WHERE x <> 128 OR y = 200),
      src(sx, sy) AS (VALUES (10, 30), (240, 60)),
      direct AS (SELECT c.x, c.y,
          GREATEST(abs(c.x - s.sx), abs(c.y - s.sy))
            - LEAST(abs(c.x - s.sx), abs(c.y - s.sy)) AS cs,
          LEAST(abs(c.x - s.sx), abs(c.y - s.sy)) AS cd
        FROM cells c JOIN src s ON ((c.x < 128) = (s.sx < 128)) AND c.x <> 128),
      viag AS (SELECT c.x, c.y,
          (GREATEST(abs(128 - s.sx), abs(200 - s.sy))
            - LEAST(abs(128 - s.sx), abs(200 - s.sy)))
          + (GREATEST(abs(c.x - 128), abs(c.y - 200))
            - LEAST(abs(c.x - 128), abs(c.y - 200))) AS cs,
          LEAST(abs(128 - s.sx), abs(200 - s.sy))
            + LEAST(abs(c.x - 128), abs(c.y - 200)) AS cd
        FROM cells c CROSS JOIN src s),
      allc AS (SELECT * FROM direct UNION ALL SELECT * FROM viag),
      bestr AS (SELECT x, y, cs, cd, row_number() OVER (
          PARTITION BY x, y ORDER BY cs + cd * sqrt(2.0), cd) AS rn
        FROM allc),
      bestd AS (SELECT x, y, cs, cd FROM bestr WHERE rn = 1)"""

  /** The same fixture as a DuckDB relation (`pts`). */
  private val sqlLinePts =
    """d(j, ddx, ddy) AS (VALUES (0,3,4),(1,6,-8),(2,-5,12),(3,8,15),
        (4,-7,-24),(5,20,-21),(6,0,9),(7,11,0)),
      raw AS (SELECT f.fid, k.k, COALESCE(d.ddx, 0) AS sdx, COALESCE(d.ddy, 0) AS sdy
        FROM range(12) f(fid) CROSS JOIN range(7) k(k)
        LEFT JOIN d ON k.k > 0 AND d.j = (f.fid*7 + k.k*5 + 3) % 8),
      pts AS (SELECT fid, k AS seq,
        CAST(fid*3 + SUM(sdx) OVER (PARTITION BY fid ORDER BY k) AS DOUBLE) AS x,
        CAST(fid*5 + SUM(sdy) OVER (PARTITION BY fid ORDER BY k) AS DOUBLE) AS y
        FROM raw),
      sg AS (SELECT fid, seg, x, y, x1 - x AS dx, y1 - y AS dy,
          sqrt((x1-x)*(x1-x) + (y1-y)*(y1-y)) AS len
        FROM (SELECT fid, seq AS seg, x, y,
            lead(x) OVER (PARTITION BY fid ORDER BY seq) AS x1,
            lead(y) OVER (PARTITION BY fid ORDER BY seq) AS y1
          FROM pts)
        WHERE x1 IS NOT NULL)"""

  // small single-file scans read as ONE partition, serializing every
  // narrow stage chained on them (tokenize/shingle/hash); spreadScan
  // repartitions right after the read (no-op at scale — stats-driven)
  private def documentsOf(s: SparkSession, dir: String): DataFrame =
    graft.ops.Adapt.spreadScan(s.read.parquet(s"$dir/documents.parquet"))
  private def embeddingsOf(s: SparkSession, dir: String): DataFrame =
    graft.ops.Adapt.spreadScan(s.read.parquet(s"$dir/embeddings.parquet"))
  private def eventsOf(s: SparkSession, dir: String): DataFrame =
    graft.ops.Adapt.spreadScan(s.read.parquet(s"$dir/events.parquet"))

  /** Shared HTML fixture for the anchor queries: two anchors per page at
    * COLLIDING host targets (no per-doc path suffix — ~97 hosts each
    * draw many inlinks, so the anchor-term aggregation is non-trivial)
    * with vocab-keyed anchor texts, and none on every 11th page. The
    * SQL oracles rebuild the identical string character-for-character.
    */
  private def anchorFixture(s: SparkSession, dir: String): DataFrame = {
    val p = Pages.pages(s, dir)
    val l1 = concat(lit("https://host"),
      ((col("doc_id") * 31 + 7) % 97).cast("string"), lit(".example/"))
    val l2 = concat(lit("https://host"),
      ((col("doc_id") * 17 + 3) % 97).cast("string"), lit(".example/about"))
    val t1 = when(col("doc_id") % 4 === 0, lit("home page"))
      .when(col("doc_id") % 4 === 1, lit("latest news"))
      .when(col("doc_id") % 4 === 2, lit("about us"))
      .otherwise(lit("home"))
    val t2 = when(col("doc_id") % 3 === 0, lit("click here"))
      .when(col("doc_id") % 3 === 1, lit("read more"))
      .otherwise(lit("home"))
    val anchors = when(col("doc_id") % 11 === 0, lit(""))
      .otherwise(concat(lit("<a class=\"nav\" href=\""), l1, lit("\">"), t1,
        lit("</a><img src=\"skip.png\"/><a href=\""), l2, lit("\">"), t2,
        lit("</a>")))
    val html = concat(
      lit("<!DOCTYPE html><html><head><title>t</title></head><body><p>"),
      col("text"), lit("</p>"), anchors, lit("</body></html>"))
    p.select(col("doc_id"), html.as("html"))
  }

  /** Deterministic 60-image PNG fixture shared by the mm_phash_* queries:
    * 12 pattern families × 5 sparse-noise variants, 48×32 RGB.
    */
  /** Street-grid fixture for the map-matching snap join, laid over the
    * hot-page microdegree cluster: horizontals, verticals, a diagonal
    * that passes exactly through the point lattice (zero-distance snaps
    * live), a short segment that every point clamps past (endpoint-b
    * case), and a far offset segment (endpoint-a case).
    */
  private val roadSegs: Seq[(Long, Long, Long, Long, Long)] = Seq(
    (0L, 2350000L, 48850000L, 2360000L, 48850000L),
    (1L, 2350000L, 48853000L, 2360000L, 48853000L),
    (2L, 2350000L, 48856000L, 2360000L, 48856000L),
    (3L, 2352000L, 48848000L, 2352000L, 48860000L),
    (4L, 2355000L, 48848000L, 2355000L, 48860000L),
    (5L, 2350000L, 48850000L, 2360000L, 48860000L),
    (6L, 2349000L, 48849000L, 2349500L, 48849500L),
    (7L, 2360000L, 48861000L, 2365000L, 48866000L))

  private def roadSegsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    roadSegs.toDF("seg_id", "ax", "ay", "bx", "by")
  }

  private def roadSegsSql: String = roadSegs
    .map { case (i, ax, ay, bx, by) => s"($i, $ax, $ay, $bx, $by)" }
    .mkString(", ")

  /** Name fixture for the Soundex queries: the NARA published vectors
    * (Ashcraft, Tymczak, Pfister, Washington, ...) plus Knuth's classic
    * equivalence families (Euler≡Ellery, Gauss≡Ghosh, Hilbert≡Heilbronn,
    * Knuth≡Kant, Lukasiewicz≡Lissajous) so the blocked-pairs query has a
    * nontrivial live block structure.
    */
  private val soundexNames: Seq[(Long, String)] = Seq(
    (0L, "Robert"), (1L, "Rupert"), (2L, "Rubin"),
    (3L, "Ashcraft"), (4L, "Ashcroft"),
    (5L, "Tymczak"), (6L, "Pfister"),
    (7L, "Washington"), (8L, "Lee"), (9L, "Gutierrez"),
    (10L, "Jackson"), (11L, "Honeyman"),
    (12L, "Smith"), (13L, "Smyth"), (14L, "Schmidt"),
    (15L, "Johnson"), (16L, "Jonson"), (17L, "Jansen"),
    (18L, "Williams"), (19L, "Wylliams"),
    (20L, "Knuth"), (21L, "Kant"),
    (22L, "Euler"), (23L, "Ellery"),
    (24L, "Gauss"), (25L, "Ghosh"),
    (26L, "Hilbert"), (27L, "Heilbronn"),
    (28L, "Lukasiewicz"), (29L, "Lissajous"))

  private def soundexNamesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    soundexNames.toDF("name_id", "name")
  }

  private def soundexNamesSql: String =
    soundexNames.map { case (id, n) => s"($id, '$n')" }.mkString(", ")

  /** Deterministic 8-doc corpus for the block-codec roundtrip queries:
    * literal-dominated prose, short-period RLE, pseudo-random noise, a
    * pure run, token cycles, html-ish markup, a 1-byte doc, and repeated
    * boilerplate — one payload shape per codec element kind.
    */
  private def lzFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    val noise = {
      var st = 7; val sb = new StringBuilder
      while (sb.length < 500) { st = st * 1103515245 + 12345; sb.append(('a' + ((st >>> 16) % 26 + 26) % 26).toChar) }
      sb.toString
    }
    val html = (0 until 40).map(i =>
      s"""<div class="row"><a href="https://host$i.example/p/$i">page $i</a></div>""").mkString("\n")
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "ab" * 300),
      (2L, noise),
      (3L, "x" * 5000),
      (4L, (0 until 80).map(i => s"token${i % 7}").mkString(" ")),
      (5L, html),
      (6L, "z"),
      (7L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do " * 8))
      .toDF("doc_id", "text")
  }

  private def phashImageFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(60).map { id =>
      val fam = (id / 5).toInt; val variant = (id % 5).toInt
      val w = 48; val h = 32
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (128 + 100 * math.sin(x * (fam + 1) * 0.2) *
            math.cos(y * (fam + 2) * 0.15)).toInt.max(0).min(255)
          val o = (y * w + x) * 3
          px(o) = v.toByte; px(o + 1) = ((v * 3 / 4) & 0xff).toByte
          px(o + 2) = ((255 - v) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      var k = 0 // sparse deterministic perturbation per variant
      while (k < variant * 6) {
        val i = (k * 197 + variant * 13) % (w * h) * 3
        px(i) = (((px(i) & 0xff) + 5).min(255)).toByte
        k += 1
      }
      (id, graft.ops.Codecs.encodePng(w, h, 3, px))
    }.toDF("doc_id", "png")
  }

  /** Fixed BPE merge table for the `bpe_encode` oracle query: hard-coded
    * (data-independent) so the DuckDB side can mirror the replace chain
    * exactly. Training itself is exercised by `bpe_train` (pinned-constant
    * merge-table oracle + BpeSpec differentials — an iterative argmax
    * loop has no LIVE SQL analog, but its output on the fixed corpus is
    * a constant).
    */
  private val bpeFixedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("the", "</w>"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("an", "d"),
    ("and", "</w>"), ("in", "g"), ("ing", "</w>"), ("e", "s"), ("o", "f"),
    ("of", "</w>"), ("t", "o"), ("to", "</w>"), ("e", "n"), ("o", "r"),
    ("a", "l"), ("i", "s"), ("is", "</w>"), ("e", "d"), ("ed", "</w>"))

  /** DuckDB mirror of [[graft.ops.TextOps.bpeEncode]]: the same wrapped
    * representation (US=chr(31) symbol separator, RS=chr(30) word joiner)
    * and the same replace chain, generated from the same constant.
    */
  private val sqlBpeEncode: String = {
    def lit(s: String) =
      "'" + s.replace("'", "''") + "'"
    val wrapped = "chr(31) || array_to_string(list_append(string_split(tok, ''), '</w>')," +
      " chr(31)||chr(31)) || chr(31)"
    var seg = "array_to_string(list_transform(list_filter(string_split(text, ' '), x -> x <> ''), " +
      s"tok -> $wrapped), chr(30))"
    bpeFixedMerges.foreach { case (a, b) =>
      seg = s"replace($seg, chr(31)||${lit(a)}||chr(31)||chr(31)||${lit(b)}||chr(31), " +
        s"chr(31)||${lit(a + b)}||chr(31))"
    }
    s"""SELECT doc_id,
          CAST((length(seg) - length(replace(seg, chr(31), ''))) // 2 AS BIGINT) AS n_bpe_tokens,
          md5(seg) AS seg_md5
        FROM (SELECT doc_id, $seg AS seg FROM documents)"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- geocoding + tiling (the north-rule spine) ---
    "geo_geocode" -> { (s, dir) =>
      Pages.pages(s, dir).select("doc_id", "lon_udeg", "lat_udeg", "lon", "lat")
    },

    "geo_destination" -> { (s, dir) =>
      // spherical direct geodesic (ST_Project): deterministic per-doc
      // bearing (doc_id%360 deg) and range (1km x (doc_id%50+1)); the
      // trig recipe (ROUND-9 degrees) absorbs libm ulp
      SpatialStats.destinationPoint(
        Pages.pages(s, dir).select(col("doc_id"), col("lon"), col("lat"),
          (col("doc_id") % 360).cast("double").as("brg"),
          (lit(1000.0) * ((col("doc_id") % 50) + 1).cast("double")).as("dist_m")),
        "brg", "dist_m")
    },
    "geo_haversine" -> { (s, dir) =>
      // nearest-anchor labeling by great-circle distance (broadcast
      // anchors, one min(struct) argmin, ROUND-9 meters — the trig
      // recipe); anchor coords are shared string constants so both
      // engines parse identical doubles
      import s.implicits._
      val anchors = AnchorFixture.rows.toDF("anchor_id", "a_lon", "a_lat")
      SpatialStats.nearestAnchor(
        Pages.pages(s, dir).select("doc_id", "lon", "lat"), anchors)
    },
    "geo_rhumb" -> { (s, dir) =>
      // rhumb-line distance (whole meters) + constant bearing (ROUND-5
      // degrees) to every anchor — the loxodrome complement to
      // geo_haversine / geo_destination
      import s.implicits._
      val anchors = AnchorFixture.rows.toDF("anchor_id", "a_lon", "a_lat")
      SpatialStats.rhumbToAnchors(
        Pages.pages(s, dir).select("doc_id", "lon", "lat"), anchors)
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

    "geo_cell_uncompact" -> { (s, dir) =>
      // coverage-set expansion: level-7 page tiles fanned out to their
      // level-9 descendants (pure Morton-suffix arithmetic, map-only)
      GraftFunctions.register(s)
      val cells = Pages.pages(s, dir).filter(col("doc_id") % 3 === 0)
        .select(GraftFunctions.gridCell(col("lon"), col("lat"), lit(7)).as("cell"))
        .distinct()
      CellSets.uncompact(cells, 9)
    },

    "geo_cell_compact" -> { (s, dir) =>
      // minimal mixed-level covering (H3 compactCells analog): even pages'
      // level-7 tiles expanded to complete level-9 subtrees + odd pages'
      // sparse level-9 tiles; compaction must contract exactly the
      // complete quads (cascading above 7 where four siblings fill in)
      // and keep the strays at level 9 — mirrored in DuckDB by an
      // unrolled 9-level complete-quad contraction chain.
      GraftFunctions.register(s)
      val p = Pages.pages(s, dir)
      val even7 = p.filter(col("doc_id") % 2 === 0)
        .select(GraftFunctions.gridCell(col("lon"), col("lat"), lit(7)).as("cell"))
        .distinct()
      val odd9 = p.filter(col("doc_id") % 2 === 1)
        .select(GraftFunctions.gridCell(col("lon"), col("lat"), lit(9)).as("cell"))
      CellSets.compact(CellSets.uncompact(even7, 9).unionAll(odd9))
    },

    "geo_s2_compact" -> { (s, dir) =>
      // the same contraction on the S2 cube-face quadtree, where the face
      // field rides in the top bits (sign bit participates for faces >= 4)
      // and level-0 face cells are roots; level-8 keys derive from the
      // level-10 cells by pure bit ops (the geo_s2_rollup identity).
      GraftFunctions.register(s)
      val p = Pages.pages(s, dir)
      val s10 = GraftFunctions.s2Cell(col("lon"), col("lat"), lit(10))
      val even8 = p.filter(col("doc_id") % 2 === 0)
        .select(GraftFunctions.s2Parent(s10, lit(2)).as("cell")).distinct()
      val odd10 = p.filter(col("doc_id") % 2 === 1).select(s10.as("cell"))
      CellSets.compactS2(CellSets.uncompactS2(even8, 10).unionAll(odd10))
    },

    "geo_cover_pip" -> { (s, dir) =>
      // hierarchical-cell PIP prefilter: each polygon's budgeted
      // mixed-level adaptive cover (GridCell.adaptiveCover, the S2
      // RegionCoverer recipe — a driver-side planning step like kernel
      // builders) broadcasts as an equi-join index; every page explodes
      // its 11-cell ancestor chain (pure bit ops, map-only) and matches
      // at most ONE cover cell per polygon (covers are prefix-free),
      // then the exact rect predicate verifies. Covers are supersets of
      // their polygons, so the result is EXACTLY plain PIP — which is
      // what the oracle computes, proving the prefilter lossless
      // end-to-end. At 10^12 pages this is the shape that wins: a few
      // hundred broadcast cells and one map-side generator instead of a
      // theta-join against every polygon.
      GraftFunctions.register(s)
      import s.implicits._
      val covers = Fixtures.polygons.flatMap { case (id, poly) =>
        graft.index.GridCell.adaptiveCover(poly, maxCells = 48, maxLevel = 10)
          .map(c => (id, c)).toSeq
      }.toDF("poly_id", "cell")
      val rects = Fixtures.rects.toDF("rid", "x_min", "x_max", "y_min", "y_max")
      val morton = col("c10").bitwiseAND(lit(0x03ffffffffffffffL))
      val pages = Pages.pages(s, dir).select(col("doc_id"), col("lon"), col("lat"))
        .withColumn("c10", GraftFunctions.gridCell(col("lon"), col("lat"), lit(10)))
        .withColumn("anc", explode(transform(sequence(lit(0), lit(10)), l =>
          shiftleft(l.cast("long"), 58) + call_function("shiftrightunsigned",
            morton, (lit(10) - l) * 2))))
      pages.join(broadcast(covers), col("anc") === col("cell"))
        .join(broadcast(rects), col("poly_id") === col("rid") &&
          col("lon") >= col("x_min") && col("lon") <= col("x_max") &&
          col("lat") >= col("y_min") && col("lat") <= col("y_max"))
        .groupBy("poly_id")
        .agg(count(lit(1)).as("n_pages"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
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

    "vector_nearest" -> { (s, dir) =>
      // nearest-feature join: each page's closest fixture rectangle
      // (point-to-box distance, 0 inside; ties by feature id) — the GIS
      // "nearest facility" primitive, exact IEEE arithmetic both engines
      import s.implicits._
      val rects = Fixtures.rects.toDF("poly_id", "x_min", "x_max", "y_min", "y_max")
      SpatialJoins.nearestRectJoin(
        Pages.pages(s, dir).select("doc_id", "lon", "lat"),
        rects, "doc_id", "lon", "lat")
    },

    "geo_pair_join" -> { (s, dir) =>
      // SELF distance join: every unordered page pair within 2 degrees,
      // both sides big (nothing broadcast) — cell bucketing with a
      // provably covering 3×3 neighborhood, certified lossless by the
      // brute-force oracle. The hot city cluster makes the hot-cell path
      // live (the 50 co-located pages pair quadratically by geometry).
      val pts = Pages.pages(s, dir)
        .select(col("doc_id").as("id"), col("lon_udeg").as("x"), col("lat_udeg").as("y"))
      RangeJoin.selfJoinCells(pts, radiusUdeg = 2000000L, level = 6)
    },

    "geo_snap_roads" -> { (s, dir) =>
      // map-matching: hot-cluster pages snapped to the broadcast street
      // grid with EXACT rational distance certificates (num/den, no
      // sqrt/division ever) and a cross-multiplied Decimal dominance
      // argmin — the trajectory-snapping primitive at crawl scale
      val p = Pages.pages(s, dir).where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("lon_udeg").as("x"), col("lat_udeg").as("y"))
      graft.joins.SnapJoin.snapToSegments(p, roadSegsDf(s))
    },
    "geo_range_join" -> { (s, dir) =>
      // distance-within join: pages within 3 degrees of each probe page,
      // via a broadcast cell-cover prefilter + exact integer verify. The
      // oracle is the BRUTE-FORCE theta join, so the hash-exact match
      // certifies the prefilter lossless end-to-end (the geo_cover_pip
      // proof pattern, applied to the radius-join family).
      val pts = Pages.pages(s, dir)
        .select(col("doc_id").as("id"), col("lon_udeg").as("x"), col("lat_udeg").as("y"))
      val probes = pts.filter(col("id") < 40)
      RangeJoin.rangeJoinCells(pts, probes, radiusUdeg = 3000000L, level = 6)
    },

    "geo_pyramid" -> { (s, dir) =>
      // the tile PYRAMID in one scan: every page explodes its level-4..8
      // ancestor chain (pure bit ops on the level-8 cell — exact because
      // the axis quotient scales by powers of two) and ONE aggregation
      // builds all five zoom levels; the oracle re-encodes each level
      // independently from lon/lat, so the match proves parent-shift ≡
      // direct encode level-for-level.
      GraftFunctions.register(s)
      val pages = Pages.pages(s, dir)
        .withColumn("c8", GraftFunctions.gridCell(col("lon"), col("lat"), lit(8)))
      val morton = col("c8").bitwiseAND(lit(0x03ffffffffffffffL))
      pages
        .withColumn("cell", explode(transform(sequence(lit(4), lit(8)), l =>
          shiftleft(l.cast("long"), 58) + call_function("shiftrightunsigned",
            morton, (lit(8) - l) * 2))))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_pages"), min("doc_id").as("min_doc"))
    },

    "geo_hotspots" -> { (s, dir) =>
      // local hotspot scores (Getis-Ord Gi* recipe, exact integers) of
      // per-cell page counts at level 7: rook-stencil neighborhood sums
      // vs the global mean density, excess in signed ppm
      GraftFunctions.register(s)
      val c7 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(7))
      val counts = Pages.pages(s, dir)
        .select(GraftFunctions.gridX(c7).as("x"), GraftFunctions.gridY(c7).as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("v"))
      SpatialStats.hotspots(counts)
    },

    "geo_hilbert" -> { (s, dir) =>
      // Hilbert curve position of each page's level-7 tile — the
      // locality-preserving sort/cluster key for tile storage (adjacent
      // curve positions are always adjacent cells, unlike Morton's
      // quadrant seams). One codegen'd expression; the oracle replays
      // the 7-step rotate/reflect walk as an unrolled CTE chain.
      GraftFunctions.register(s)
      val c7 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(7))
      Pages.pages(s, dir).select(col("doc_id"),
        GraftFunctions.hilbertD(
          GraftFunctions.gridX(c7), GraftFunctions.gridY(c7), lit(7)).as("hd"))
    },

    "geo_cell_skew" -> { (s, dir) =>
      // skew report over level-7 tile loads: hot-cell mass + exact Gini
      // ppm — the "does this tiling need salting?" planning diagnostic
      GraftFunctions.register(s)
      val c7 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(7))
      val counts = Pages.pages(s, dir)
        .select((GraftFunctions.gridX(c7) * 128 + GraftFunctions.gridY(c7)).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("v"))
      SpatialStats.cellSkew(counts)
    },

    "geo_moran" -> { (s, dir) =>
      // global Moran's I of per-cell page counts (rook adjacency, level
      // 7): the clustering diagnostic over the tiling spine, as exact
      // integer certificates + a sign-explicit truncated ppm
      GraftFunctions.register(s)
      val c7 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(7))
      val counts = Pages.pages(s, dir)
        .select(GraftFunctions.gridX(c7).as("x"), GraftFunctions.gridY(c7).as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("v"))
      SpatialStats.moranI(counts)
    },

    "geo_geohash" -> { (s, dir) =>
      // base-32 geohash (the interchange cell index): pure bit arithmetic,
      // one codegen span, mirrored op-for-op in SQL (sqlGeohash). gh4 is
      // the string-prefix rollup — exact because the axis quotient is
      // multiplied by a power of two (see Geohash scaladoc).
      Pages.pages(s, dir)
        .select(col("doc_id"), Geohash.encodeCol(col("lon"), col("lat"), 8).as("gh8"))
        .withColumn("gh4", substring(col("gh8"), 1, 4))
    },

    "geo_s2_cells" -> { (s, dir) =>
      // cube-face quadtree assignment (r3: full SQL mirror — trig +
      // quotient + quadratic ST + floor + bit interleave; see sqlS2Cell)
      GraftFunctions.register(s)
      Pages.pages(s, dir)
        .select(col("doc_id"),
          GraftFunctions.s2Cell(col("lon"), col("lat"), lit(10)).as("s2"))
        .groupBy("s2").agg(count(lit(1)).as("n_pages"), min("doc_id").as("min_doc"))
    },

    "geo_s2_rollup" -> { (s, dir) =>
      // multi-resolution rollup: the engine derives level-7 keys from
      // level-10 cells with pure bit ops (s2_parent); the oracle
      // re-derives level-7 cells from lon/lat through the full
      // cube-projection trig path — the two must agree cell-for-cell
      GraftFunctions.register(s)
      Pages.pages(s, dir)
        .select(col("doc_id"), GraftFunctions.s2Parent(
          GraftFunctions.s2Cell(col("lon"), col("lat"), lit(10)), lit(3)).as("s2"))
        .groupBy("s2").agg(count(lit(1)).as("n_pages"), min("doc_id").as("min_doc"))
    },

    "geo_s2_kring" -> { (s, dir) =>
      // cross-face S2 k-ring expansion over an adversarial fixture grid
      // (face corners, poles, dateline, face-edge midpoints — the points
      // where ring membership exercises the cube-face wrap). Deterministic
      // integer cell ids → pinned-constant oracle; sf-driven S2 usage is
      // covered hash-exact by geo_s2_cells / geo_s2_rollup.
      GraftFunctions.register(s)
      import s.implicits._
      val pts = (for {
        lon <- Seq(-180.0, -135.0, -90.0, -45.0, 0.0, 45.0, 90.0, 135.0, 179.9)
        lat <- Seq(-89.9, -45.0, -0.1, 0.0, 45.0, 89.9)
      } yield (lon, lat)) ++ Seq((0.0, 90.0), (0.0, -90.0), (180.0, 0.0)) ++
        // the eight cube-corner directions (lat = ±atan(1/√2)) — the only
        // points where a cell's corner-neighbor set degenerates (ring < 9)
        (for { lon <- Seq(-135.0, -45.0, 45.0, 135.0)
               lat <- Seq(-35.26438968275466, 35.26438968275466) } yield (lon, lat))
      pts.zipWithIndex.map { case ((lon, lat), i) => (i.toLong, lon, lat) }
        .toDF("doc_id", "lon", "lat")
        .select(col("doc_id"),
          GraftFunctions.s2Cell(col("lon"), col("lat"), lit(6)).as("s2"))
        .select(col("doc_id"), col("s2"),
          explode(GraftFunctions.s2KRing(col("s2"), lit(1))).as("ring_cell"))
        .groupBy("s2").agg(countDistinct("ring_cell").as("ring_size"),
          count(lit(1)).as("n_rows"))
    },

    "geo_knn_cell" -> { (s, dir) =>
      // large-probe-set kNN: k-ring candidate expansion on the cell grid.
      // r3: oracle-checked against the exact all-pairs SQL — the pruned
      // variant matches the exact result on the deterministic fixture
      // (98.5% of rows ring-guaranteed; KnnSpec asserts the equivalence
      // property and exercises the `guaranteed` flag)
      val pts = Pages.pages(s, dir)
        .select(col("doc_id").as("id"), col("lon_udeg").as("x"), col("lat_udeg").as("y"))
      KnnJoin.knnCellPruned(pts, level = 5, rings = 2, k = 3)
        .select("query_id", "neighbor_id", "dist2", "rank")
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

    "raster_zonal_full" -> { (s, _) =>
      graft.tiles.Zonal.zonalStatsFull(
        TileOps.createRaster(s, rasterSpec)(rasterValue), zonePolys)
    },

    "raster_zonal_weighted" -> { (s, _) =>
      // exactextract-style area-weighted zonal stats: coverage fractions
      // from the exact clip kernel; sixteenth-aligned zones keep every
      // fraction/partial sum an exact binary fraction (order-free FP)
      graft.tiles.Zonal.zonalWeighted(
        TileOps.createRaster(s, rasterSpec)(rasterValue), wzonePolys)
    },

    "raster_coregister" -> { (s, _) =>
      // EFolki dense-flow coregistration of a synthetically shifted pair.
      // Iterative LK flow has no SQL mirror, but the per-tile mean flow is
      // bit-stable across parallelism (verified at local[2/7/32]) →
      // pinned-constant oracle; shift recovery is also pinned in FolkiSpec.
      val spec = rasterSpec.copy(width = 128, height = 128, bands = 1, tileSize = 32)
      def tex(x: Int, y: Int): Double =
        10.0 * math.sin(x * 0.21) + 8.0 * math.cos(y * 0.17) +
          5.0 * math.sin((x + 2 * y) * 0.11) + 0.01 * x * y
      val ref = TileOps.createRaster(s, spec)((x, y, _) => tex(x, y))
      val tgt = TileOps.createRaster(s, spec)((x, y, _) => tex(x - 2, y - 1))
      graft.tiles.Folki.coregister(ref, tgt, spec, halo = 32)
        .groupBy((col("x") / 32).cast("int").as("tile_x"),
          (col("y") / 32).cast("int").as("tile_y"))
        .agg(avg("u").as("mean_u"), avg("v").as("mean_v"),
          count(lit(1)).as("n_px"))
    },

    "patch_factors" -> { (s, _) =>
      // optimal patch split factors over a grid of (num_patches, size)
      // combos (core_raster_offsets.py:11-73)
      import s.implicits._
      val sizes = Seq((256, 256), (100, 64), (512, 128), (64, 512))
      val rows = for (np <- 1 to 32; (w, h) <- sizes) yield {
        val (hp, wp) = PatchGrid.findOptimalPatchFactors(np, w, h)
        (np, w, h, hp, wp)
      }
      rows.toDF("num_patches", "width", "height", "h_patches", "w_patches")
    },
    "patch_offsets" -> { (s, _) =>
      // overlap-grown read windows for a 100×64 image in 6 patches
      // (core_raster_offsets.py:74-141)
      import s.implicits._
      PatchGrid.patchOffsets(100, 64, 6, overlap = 4)
        .toDF("x", "y", "size_x", "size_y")
    },
    "raster_zonal_approx" -> { (s, _) =>
      // continuous-raster zonal path (rows-only: percentile_approx
      // sketches have no DuckDB-exact oracle; accuracy vs the exact
      // histogram path is pinned in ZonalApproxSpec)
      graft.tiles.Zonal.zonalStatsApprox(
        TileOps.createRaster(s, rasterSpec)((x, y, b) =>
          rasterValue(x, y, b) + ((x * 31 + y * 17) % 101) / 101.0), zonePolys)
    },

    "raster_convolve_sum" -> { (s, _) =>
      // raw (unnormalised) all-ones kernel; edges renormalize weights back
      // to the kernel total (reference base.py:153-156) → sum*9/n
      val conv = TileOps.convolve(TileOps.createRaster(s, convSpec)(rasterValue),
        radius = 1, method = "sum", normalised = false)
      TileOps.toPixels(conv, convSpec.tileSize)
    },

    "raster_convolve_median" -> { (s, _) =>
      val conv = TileOps.convolve(TileOps.createRaster(s, convSpec)(rasterValue),
        radius = 1, method = "median")
      TileOps.toPixels(conv, convSpec.tileSize)
    },

    // --- align / morphology / stack / timeseries ---
    "raster_align" -> { (s, _) =>
      // source grid is offset from the reference by a non-tile-multiple
      val srcSpec = RasterSpec(3.0, 61.0, 0.25, -0.25, 192, 192, 64, 1)
      val src = TileOps.createRaster(s, srcSpec)((x, y, _) => ((x * 11 + y * 3) % 89).toDouble)
      TileOps.tileStats(TileOps2.align(src, rasterSpec.copy(bands = 1)))
        .filter(col("n_px") > 0)
    },

    "raster_erode" -> { (s, _) =>
      TileOps.toPixels(TileOps2.erode(
        TileOps.createRaster(s, convSpec)(rasterValue), 1), convSpec.tileSize)
    },

    "raster_open" -> { (s, _) =>
      TileOps.toPixels(TileOps2.open(
        TileOps.createRaster(s, convSpec)(rasterValue), 1), convSpec.tileSize)
    },

    "raster_stack" -> { (s, _) =>
      val a = TileOps.createRaster(s, rasterSpec)(rasterValue)
      val b = TileOps.createRaster(s, rasterSpec.copy(bands = 1))(
        (x, y, _) => ((x * 11 + y * 3) % 89).toDouble)
      TileOps.tileStats(TileOps2.stack(Seq(a -> rasterSpec.bands, b -> 1)))
    },

    "raster_mosaic" -> { (s, _) =>
      // two rasters on different grids mosaicked onto the reference grid
      // (mean of the overlapping contributions)
      val refSpec = rasterSpec.copy(bands = 1)
      val a = TileOps.createRaster(s, refSpec)(rasterValue)
      val srcSpec = RasterSpec(3.0, 61.0, 0.25, -0.25, 192, 192, 64, 1)
      val b = TileOps.createRaster(s, srcSpec)((x, y, _) => ((x * 11 + y * 3) % 89).toDouble)
      TileOps.toPixels(TileOps2.mosaic(Seq(a, b), refSpec), refSpec.tileSize)
    },
    "raster_timeslope" -> { (s, _) =>
      val spec4 = rasterSpec.copy(bands = 4)
      val r = TileOps.createRaster(s, spec4)(
        (x, y, b) => ((x * 5 + y * 3 + b * b * 7) % 53).toDouble)
      TileOps.toPixels(TileOps2.timeSlope(r, 4), rasterSpec.tileSize)
    },

    "raster_reproject" -> { (s, _) =>
      // 4326 → 3857 nearest inverse-mapping. Trig differs across ENGINES
      // (so no live DuckDB mirror), but the JVM-side mapping is bit-stable
      // across parallelism (verified at local[2/7/32]) → pinned-constant
      // oracle; exactness also covered by TileSpec ScalaTest
      val src = TileOps.createRaster(s, rasterSpec.copy(bands = 1))(
        (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      val dst = RasterSpec(0.0, 9000000.0, 30000.0, -30000.0, 240, 240, 60, 1, crs = 3857)
      TileOps.tileStats(TileOps2.reproject(src, rasterSpec.copy(bands = 1), dst))
        .filter(col("n_px") > 0)
    },

    // --- text analysis (training-data pipeline ops) ---
    "text_stats" -> { (s, dir) => TextOps.textStats(documentsOf(s, dir)) },
    "text_bpe_tokens" -> { (s, dir) => TextOps.bpeTokenCount(documentsOf(s, dir)) },
    "text_quality" -> { (s, dir) => TextOps.qualityScore(documentsOf(s, dir)) },
    "text_langid" -> { (s, dir) => TextOps.langId(documentsOf(s, dir)) },
    "text_chi2_features" -> { (s, dir) =>
      // per-class discriminative tokens: exact integer chi-square over
      // the 2x2 presence table, top-5 per lang on a total order
      TextOps.chi2Features(documentsOf(s, dir))
    },
    "text_langid_eval" -> { (s, dir) =>
      // measure the heuristic against the labeled column: confusion
      // matrix + global accuracy in exact ppm
      TextOps.langIdEval(documentsOf(s, dir))
    },
    "text_scripts" -> { (s, dir) =>
      // Unicode script profile over a planted multi-script fixture:
      // pure Cyrillic/Greek/CJK docs, an Arabic-suffixed Latin doc
      // (mixed counts, Latin stays dominant), and a digits-only doc
      // (dominant "none"). The oracle re-counts every block with RE2
      // \x{...} classes — engine-independent same-math mirror.
      val d = documentsOf(s, dir)
      val m = col("doc_id") % 6
      val t = when(m === 1, lit(ScriptFixture.cyr))
        .when(m === 2, concat(substring(col("text"), 1, 20), lit(ScriptFixture.cjk)))
        .when(m === 3, lit(ScriptFixture.grk))
        .when(m === 4, concat(col("text"), lit(ScriptFixture.arb)))
        .when(m === 5, lit(ScriptFixture.none))
        .otherwise(col("text"))
      TextOps.scriptProfile(d.select(col("doc_id"), t.as("text")))
    },
    "text_fingerprint" -> { (s, dir) => TextOps.fingerprint(documentsOf(s, dir)) },
    // winnowing fingerprint selection (Schleimer et al. 2003 / MOSS);
    // md5prefix family so DuckDB reproduces the hash — production is
    // xxhash64 (WinnowSpec proves the families select the same positions)
    "text_winnow" -> { (s, dir) =>
      TextOps.winnow(documentsOf(s, dir), k = 4, w = 4, family = "md5prefix")
    },
    // candidate near-dup pairs over shared winnow fingerprints; uncapped
    // (-1) so the SQL self-join is the exact mirror — production default
    // caps hot fingerprint buckets at 1024 (lowest-doc_id subset)
    "text_winnow_pairs" -> { (s, dir) =>
      TextOps.winnowPairs(documentsOf(s, dir), k = 4, w = 4,
        minShared = 2, family = "md5prefix", capPerBucket = -1)
    },
    "text_segment_dedup" -> { (s, dir) => TextOps.segmentDedup(documentsOf(s, dir)) },
    // exact-substring dedup (8-token windows); string-keyed so the oracle
    // mirrors the shuffle key exactly — production uses hashKey=true
    // (xxhash64; SubstrDedupSpec proves the keyings agree)
    "text_substr_dedup" -> { (s, dir) =>
      TextOps.substringDedup(documentsOf(s, dir), k = 8, hashKey = false)
    },
    "text_fix_encoding" -> { (s, dir) =>
      // ftfy-style mojibake repair: plant UTF-8-as-Latin-1 corruption on
      // a doc_id-keyed case lattice (single + double mojibake + a CJK
      // case), plus a genuine-Latin-1 control that must NOT change; the
      // oracle replays the closed-form ground truth per case
      val m = col("doc_id") % 5
      val planted = concat(col("text"),
        when(m === 1, lit(" caf\u00c3\u00a9")) // mojibake(e-acute)
          .when(m === 2, lit(" x\u00c3\u0083\u00c2\u00a9")) // mojibake^2(e-acute)
          .when(m === 3, lit(" caf\u00e9")) // genuine Latin-1 e-acute
          .when(m === 4, lit(" y\u00e6\u00bc\u00a2")) // mojibake(U+6F22)
          .otherwise(lit("")))
      val fixed = TextOps.fixEncoding(planted, passes = 2)
      documentsOf(s, dir).select(col("doc_id"), fixed.as("fixed"),
        (fixed =!= planted).as("changed"))
    },
    "text_gopher_rules" -> { (s, dir) => TextOps.gopherRules(documentsOf(s, dir)) },
    "text_repetition" -> { (s, dir) => TextOps.repetitionMetrics(documentsOf(s, dir)) },
    "url_normalize" -> { (s, dir) => WebOps.urlNormalize(Pages.pages(s, dir)) },
    "url_reg_domain" -> { (s, dir) =>
      // eTLD+1 extraction over an 8-pattern host fixture exercising:
      // multi-label suffix (co.uk), longest-match (gov.uk over uk),
      // deep subdomains, unknown TLD (implicit 1-label rule), a bare
      // 1-label host, and a host that IS a public suffix (-> null).
      // The oracle is the CLOSED-FORM expected registered domain per
      // pattern — fully independent of the engine's join recipe.
      import s.implicits._
      val g = (col("doc_id") % 5).cast("string")
      val m = col("doc_id") % 8
      val host = when(m === 0, concat(lit("www.site"), g, lit(".co.uk")))
        .when(m === 1, concat(lit("blog.site"), g, lit(".com")))
        .when(m === 2, concat(lit("site"), g, lit(".gov.uk")))
        .when(m === 3, concat(lit("a.b.site"), g, lit(".org")))
        .when(m === 4, concat(lit("site"), g, lit(".example")))
        .when(m === 5, lit("localhost"))
        .when(m === 6, lit("co.uk"))
        .otherwise(concat(lit("x.y.z.w.site"), g, lit(".co.uk")))
      val suffixes = Seq("co.uk", "gov.uk", "com", "org", "uk").toDF("suffix")
      WebOps.registeredDomain(
        documentsOf(s, dir).select(col("doc_id"), host.as("host")), suffixes)
    },
    "url_host_stats" -> { (s, dir) => WebOps.hostStats(Pages.pages(s, dir)) },
    "url_dedup_latest" -> { (s, dir) =>
      // recrawl-collapse fixture: every third page is fetched twice (the
      // refetch usually newer, sometimes older), keep-latest must pick
      // per-url winners from both branches
      val p = Pages.pages(s, dir).select(col("doc_id"), col("url"), col("warc_sec"), col("lang"))
      val refetch = p.filter(col("doc_id") % 3 === 0)
        .withColumn("warc_sec", when(col("doc_id") % 6 === 0, col("warc_sec") - 1000L)
          .otherwise(col("warc_sec") + 86400L))
        .withColumn("fetch_no", lit(1))
      WebOps.urlDedupLatest(p.withColumn("fetch_no", lit(0)).unionByName(refetch))
    },
    "html_extract" -> { (s, dir) =>
      // real tag-strip extraction over synthesized HTML; `ok` asserts the
      // north-rule invariant per row: extracted text byte-identical to src
      val wrapped = WebOps.htmlWrap(col("url"), col("text"), col("lang"))
      Pages.pages(s, dir).select(col("url"),
        md5(encode(WebOps.extractText(wrapped), "UTF-8")).as("text_md5"),
        (WebOps.extractText(wrapped) === col("text")).as("ok"))
    },
    "warc_revisit" -> { (s, dir) =>
      // ingestion-time payload dedup: 120 distinct payloads across the
      // corpus, so each digest group holds several fetches — exactly one
      // response, the rest revisit records with exact byte savings
      import graft.ops.Warc
      val p = Pages.pages(s, dir)
      val pay = encode(
        concat(lit("payload-"), (col("doc_id") % 120).cast("string")), "UTF-8")
      Warc.revisitTable(p.select(col("doc_id"), col("url"), col("warc_sec"),
        pay.as("payload")))
    },
    "warc_roundtrip" -> { (s, dir) =>
      // WARC/1.0 container round trip: pages → codegen'd record synthesis
      // → multi-record segment blobs (64 segments) → from-scratch byte
      // scanner back to typed rows. The oracle recomputes every parsed
      // field (uri, Zulu date, payload md5, exact record byte length)
      // from the source table — container-level byte exactness.
      import graft.ops.Warc
      val segs = Warc.segmentTable(Pages.pages(s, dir), pmod(col("doc_id"), lit(64)))
      Warc.parseTable(segs, "seg_id", "blob")
        .select(
          regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("target_uri"), col("warc_date"),
          md5(col("payload")).as("payload_md5"),
          col("rec_len").cast("long").as("rec_len"),
          (col("warc_type") === "response").as("ok"))
    },
    "warc_gz_roundtrip" -> { (s, dir) =>
      // .warc.gz convention: ONE gzip member per record, members
      // concatenated per segment; decode splits members (strict CRC32 +
      // ISIZE), inflates independently, parses the record inside. The
      // oracle is the same first-principles field recomputation as the
      // uncompressed path — compression must be invisible to every
      // parsed byte. member_offset correctness (CDX-style re-fetch) is
      // pinned in WarcSpec.
      import graft.ops.Warc
      val segs = Warc.segmentTableGz(Pages.pages(s, dir), pmod(col("doc_id"), lit(64)))
      Warc.parseGzTable(segs, "seg_id", "blob")
        .select(
          regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("target_uri"), col("warc_date"),
          md5(col("payload")).as("payload_md5"),
          col("rec_len").cast("long").as("rec_len"),
          (col("warc_type") === "response" && col("member_offset") >= 0).as("ok"))
    },
    "warc_zstd_roundtrip" -> { (s, dir) =>
      // .warc.zst convention: ONE zstd frame per record, frames
      // concatenated per segment; decode splits frames (from-scratch
      // RFC 8878 decoder), parses the record inside. Same oracle as the
      // gzip path — the container codec must be invisible to every
      // parsed byte.
      import graft.ops.Warc
      val segs = Warc.segmentTableZstd(Pages.pages(s, dir), pmod(col("doc_id"), lit(64)))
      Warc.parseZstdTable(segs, "seg_id", "blob")
        .select(
          regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("target_uri"), col("warc_date"),
          md5(col("payload")).as("payload_md5"),
          col("rec_len").cast("long").as("rec_len"),
          (col("warc_type") === "response" && col("member_offset") >= 0).as("ok"))
    },
    "warc_cdx_fetch" -> { (s, dir) =>
      // CDX random-access proof: index each .warc.gz segment, then
      // re-fetch EVERY record through the (offset, length) coordinate —
      // fetchRecord slices and inflates only that member, the CC
      // range-GET path. The oracle's md5(text) cross-checks that every
      // fetched payload is byte-identical to the source page.
      import s.implicits._
      import graft.ops.Warc
      val segs = Warc.segmentTableGz(Pages.pages(s, dir), pmod(col("doc_id"), lit(64)))
      segs.select(col("seg_id"), col("blob")).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (_, blob) =>
            // same coordinate walk cdxTable indexes with; here each
            // coordinate is driven through the fetch path instead
            Warc.gunzipMembersWithLen(blob).map { case (off, len, _) =>
              val r = Warc.fetchRecord(blob, off, len)
              (r.targetUri, Warc.md5Hex(md, r.payload))
            }
          }
        }
        .toDF("target_uri", "payload_md5")
        .select(
          regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("payload_md5"), lit(true).as("fetch_ok"))
    },
    "text_tfidf" -> { (s, dir) => TextOps.tfidf(documentsOf(s, dir), k = 5) },
    "text_bm25" -> { (s, dir) =>
      // ROUND-9 both sides: Spark's log is StrictMath.log, DuckDB's ln is
      // libm — 1-ulp apart on many args. Rank-safe: the smallest nonzero
      // adjacent-rank score gap through the cut is ~1.3e-5, ten orders
      // above the cross-engine error, and exact ties break on tok in
      // both engines
      TextOps.bm25(documentsOf(s, dir), k = 5)
        .withColumn("score", round(col("score"), 9))
    },
    "text_curate" -> { (s, dir) => TextOps.curate(documentsOf(s, dir), maxDupFrac = 0.6) },
    // distributed tokenizer training: one corpus pass, then vocabulary-
    // bounded merge iterations. Trains on a pinned deterministic corpus
    // (120 docs over a 12-word zipf-ish vocab) so the learned merge table
    // is a hash-exact constant oracle (VERDICT r4 #5 — an iterative
    // argmax has no SQL analog, but its RESULT on a fixed corpus is a
    // constant); BpeSpec still pins the trainer differentially against an
    // independent single-threaded reference on random corpora.
    "bpe_train" -> { (s, _) =>
      import s.implicits._
      val vocab = Seq("the", "then", "there", "ingest", "ingesting", "rest",
        "rested", "resting", "and", "sand", "standing", "thing")
      val docs = s.range(120).map { id =>
        val words = (0 until 20).map { j =>
          // zipf-ish skew: low vocab indexes dominate
          vocab((((id * 31 + j * 17) % 97) % ((j % 7) + 1) + (id + j) % 3).toInt % vocab.length)
        }
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
      TextOps.bpeTrain(docs, nMerges = 16).orderBy("rank")
    },
    "bpe_encode" -> { (s, dir) => TextOps.bpeEncode(documentsOf(s, dir), bpeFixedMerges) },
    "text_decontaminate" -> { (s, dir) =>
      // benchmark set = every 41st document of the same corpus: the
      // dup-heavy fixture guarantees real 6-gram collisions from its
      // near-duplicate clusters, not from vocabulary chance
      val docs = documentsOf(s, dir)
      TextOps.decontaminate(docs, docs.filter(col("doc_id") % 41 === 0), n = 6)
    },
    "text_classifier" -> { (s, dir) =>
      TextOps.classifierScore(documentsOf(s, dir), buckets = 1024,
        family = "md5prefix")
    },
    "text_charlm" -> { (s, dir) =>
      TextOps.charLmScore(documentsOf(s, dir), col("doc_id") % 5 === 0)
    },
    "text_dsir" -> { (s, dir) =>
      // importance-resampling weights toward the English slice of the
      // corpus as the "target domain"; md5prefix is the oracle-mirror
      // family, pinned HERE only — the production default is xxhash64
      TextOps.dsirWeights(documentsOf(s, dir), col("lang") === "en",
        buckets = 4096, family = "md5prefix")
    },
    "text_readability" -> { (s, dir) =>
      // Flesch + ARI as exact integer ppm over [aeiouy]+ syllable runs
      // and [.!?]+ sentence runs — marker-free run counting, DIV-only
      TextOps.readability(documentsOf(s, dir))
    },
    "url_host_cap" -> { (s, dir) => WebOps.capPerHost(Pages.pages(s, dir), n = 3) },
    "url_blocklist" -> { (s, dir) =>
      import s.implicits._
      val blocked = Seq("host0.example", "host13.example", "host51.example").toDF("host")
      WebOps.filterHosts(Pages.pages(s, dir).select("doc_id", "url"), blocked)
    },
    "text_hashing" -> { (s, dir) =>
      // hashing-trick featurization, md5prefix oracle family (xxhash64
      // is the production default — same plan, different hash)
      TextOps.hashingTrick(documentsOf(s, dir), dims = 16, family = "md5prefix")
    },
    "text_comp_ratio" -> { (s, dir) =>
      // deflate redundancy signal over a deterministic fixture corpus
      // (pinned-constant oracle: zlib output is an environment pin,
      // the mm_jpeg_decode class)
      import s.implicits._
      val docs = Seq(
        (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1L, "ab" * 200),
        (2L, (0 until 400).map(i => ('a' + (i * 17 + 5) % 26).toChar).mkString),
        (3L, "z"),
        (4L, ((0 until 60).map(i => s"token${i % 7}")).mkString(" ")),
        (5L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do " * 4))
        .toDF("doc_id", "text")
      TextOps.compressionRatio(docs)
    },
    "mm_snappy_roundtrip" -> { (s, _) =>
      // from-scratch Snappy block codec (cross-validated both directions
      // against org.xerial.snappy in LzSpec); pinned-constant oracle —
      // the fixture is deterministic so comp_len is a constant, the
      // text_comp_ratio class
      graft.ops.Lz.roundtripTable(lzFixture(s), "doc_id", "text", "snappy")
    },
    "mm_lz4_roundtrip" -> { (s, _) =>
      // from-scratch LZ4 block codec (cross-validated both directions
      // against net.jpountz.lz4 incl. its HC encoder in LzSpec);
      // pinned-constant oracle, same class as mm_snappy_roundtrip
      graft.ops.Lz.roundtripTable(lzFixture(s), "doc_id", "text", "lz4")
    },
    "mm_zstd_roundtrip" -> { (s, _) =>
      // from-scratch RFC 8878 decoder (ZstdSpec cross-validates it
      // against zstd-jni across levels -5..19, checksummed and
      // multi-block frames) + spec-valid store-mode encoder (raw+RLE
      // blocks); pinned-constant oracle, the mm_snappy class
      graft.ops.Lz.roundtripTable(lzFixture(s), "doc_id", "text", "zstd")
    },
    "events_paths" -> { (s, dir) =>
      // top-20 session flows: 30-min sessions, first 5 steps, '>'-joined
      Events.sessionPaths(eventsOf(s, dir))
    },
    "events_wau" -> { (s, dir) =>
      // exact rolling DAU/WAU via the bounded 7× user-day fanout
      Events.activeUsers(eventsOf(s, dir))
    },
    "raster_crosstab" -> { (s, _) =>
      // TabulateArea: 16-px block classes × the standard value plane
      val spec = convSpec.copy(bands = 1)
      val classes = TileOps.createRaster(s, spec)(
        (x, y, _) => ((x / 16 + y / 16) % 4).toDouble)
      val values = TileOps.createRaster(s, spec)(
        (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      TileOps2.crosstab(classes, values)
    },
    "tpch_q18" -> { (s, dir) =>
      Relational.largeOrders(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet"))
    },
    "events_decay" -> { (s, dir) =>
      // recency-weighted activity in EXACT integer decay units 2^-30
      // (dyadic half-life weights: no FP, no rounding recipe, no
      // summation-order sensitivity)
      Events.decayScores(eventsOf(s, dir))
    },
    "events_trajectory" -> { (s, dir) =>
      // per-user movement summary: event positions synthesized as exact
      // dyadic halves from event_id (both engines parse identical
      // doubles); hop lengths in ROUND-0 whole meters (trig recipe)
      val pts = eventsOf(s, dir).select(col("user_id"), col("ts"),
        col("event_id").as("seq"),
        (((col("event_id") * 29) % 720).cast("double") / 2.0 - 180.0).as("lon"),
        (((col("event_id") * 37) % 320).cast("double") / 2.0 - 80.0).as("lat"))
      Events.trajectorySummary(pts)
    },
    "emb_rp" -> { (s, dir) =>
      // Johnson–Lindenstrauss ±1 projection 64→8 in exact Long
      // arithmetic; flattened via posexplode for the oracle
      val proj = Similarity.randomProjection(
        s.read.parquet(s"$dir/embeddings.parquet"), outDims = 8)
      proj.select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "pv")))
    },
    "select_kcenters" -> { (s, dir) =>
      // Gonzalez farthest-point traversal, k=5, exact integer distances;
      // oracle is the unrolled per-round argmax CTE chain
      graft.ops.Selection.kCenters(s.read.parquet(s"$dir/embeddings.parquet"), k = 5)
    },
    "geo_dbscan" -> { (s, dir) =>
      // density clustering over page locations: ε = 2°, minPts = 4 —
      // the Paris hot cluster is one dense component, sparse randoms
      // contribute cores/borders/noise; lowest-label border contract
      val pts = Pages.pages(s, dir).select(col("doc_id").as("id"),
        col("lon_udeg").as("x"), col("lat_udeg").as("y"))
      graft.ops.Dbscan.dbscan(pts, epsUdeg = 2000000L, minPts = 4, level = 6)
    },
    "emb_kmeans" -> { (s, dir) =>
      // exact-rational Lloyd: k=4 Gonzalez seeds, 3 assignment rounds,
      // Decimal cross-multiplied argmin; oracle unrolls the same rounds
      Similarity.kMeans(s.read.parquet(s"$dir/embeddings.parquet"),
        k = 4, iters = 3)
    },
    "raster_reclass" -> { (s, _) =>
      // range reclassification: half-open bins over the integer fixture
      TileOps.toPixels(TileOps2.reclassify(
        TileOps.createRaster(s, rasterSpec)(rasterValue),
        breaks = Array(20.0, 40.0, 60.0, 80.0),
        classes = Array(1.0, 2.0, 3.0, 4.0, 5.0)), rasterSpec.tileSize)
    },
    "raster_pansharpen" -> { (s, _) =>
      // Brovey ratio pan-sharpen: integer MS and pan products are exact,
      // the single ratio division mirrors op-for-op in SQL
      val ms = TileOps.createRaster(s, rasterSpec)(rasterValue)
      val pan = TileOps.createRaster(s, rasterSpec.copy(bands = 1))(
        (x, y, _) => ((x * 11 + y * 3) % 97).toDouble)
      TileOps.toPixels(TileOps2.pansharpen(ms, pan, rasterSpec.bands),
        rasterSpec.tileSize)
    },
    "geo_coverage" -> { (s, _) =>
      // exactextract-style per-cell coverage fractions: quarter-aligned
      // rect features on the unit grid keep every clip vertex, shoelace
      // product, and fraction an exact binary fraction — the SQL mirror
      // is the closed-form rect overlap
      import s.implicits._
      val feats = (0 until 10).map { fid =>
        val x0 = fid * 3 + 0.25; val y0 = fid * 2 + 0.5
        val x1 = x0 + 2.5; val y1 = y0 + 1.75
        (fid.toLong, s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")
      }.toDF("fid", "wkt")
      graft.ops.VectorOps2.coverageFractions(feats, "fid", "wkt", cellSize = 1.0)
    },
    "vector_tile_clip" -> { (s, _) =>
      // polygon layer partitioned onto a 4.0 tile grid (the vector-tile
      // cut / overlay shuffle key): rect features spanning 2-3 tiles per
      // axis; canonical-ring WKT makes the emit string-exact against the
      // closed-form rect∩tile mirror
      import s.implicits._
      val feats = (0 until 12).map { fid =>
        val x0 = fid * 1.75 + 0.25; val y0 = fid * 1.25 + 0.5
        val x1 = x0 + 6.5; val y1 = y0 + 3.75
        (fid.toLong, s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")
      }.toDF("fid", "wkt")
      graft.ops.VectorOps2.clipToGrid(feats, "fid", "wkt", tileSize = 4.0)
    },
    "geo_sph_area" -> { (s, _) =>
      // spherical polygon area (Chamberlain & Duquette) — per-row
      // sequential trig fold, pinned-constant oracle (bit-stable across
      // parallelism by construction)
      import s.implicits._
      val feats = Seq(
        (0L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        (1L, "POLYGON ((10 50, 11 50, 11 51, 10 51, 10 50))"),
        (2L, "POLYGON ((-3 -2, 4 -1, 3 5, -4 4, -3 -2))"),
        (3L, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 5 2, 5 5, 2 5, 2 2))"))
        .toDF("fid", "wkt")
      graft.ops.VectorOps2.sphericalArea(feats, "fid", "wkt")
    },
    "vector_polylabel" -> { (s, _) =>
      // pole of inaccessibility (Mapbox polylabel), fixture-input: four
      // asymmetric shapes incl. a holed rect and an L — pure per-row
      // quadtree refinement with a TOTAL cell order, so the answer is
      // parallelism-independent and the oracle pinned constants
      // (tools/pin_oracle.py flow, like vector_simplify)
      import s.implicits._
      val feats = Seq(
        (0L, "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 12, 0 12, 0 0))"),
        (1L, "POLYGON ((0 0, 20 0, 20 10, 0 10, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2))"),
        (2L, "POLYGON ((0 0, 30 1, 2 5, 0 0))"),
        (3L, "POLYGON ((0 0, 12 2, 16 9, 7 14, -2 8, 0 0))")).toDF("fid", "wkt")
      graft.ops.VectorOps2.poleOfInaccessibility(feats, "fid", "wkt",
        precision = 1e-3)
    },
    "vector_segments" -> { (s, _) =>
      // per-segment length + azimuth over the Pythagorean polyline
      // fixture: integer vertices make dx/dy exact and every length an
      // exact integer; azimuth carries the ROUND-9 trig recipe
      LineOps.segmentMetrics(lineFixture(s))
    },
    "vector_densify" -> { (s, _) =>
      // ST_Segmentize semantics at maxLen 4: evenly spaced intermediate
      // vertices, one generator + one fid window — mirrored expression
      // for expression in the oracle
      LineOps.densify(lineFixture(s), maxLen = 4.0)
    },
    "vector_line_interp" -> { (s, _) =>
      // ST_LineInterpolatePoint at 1/4, 1/2, 3/4: the Pythagorean fixture
      // keeps every cumulative length an exact FP integer, so the window
      // prefix sum is order-independent and the winning segment (and its
      // one IEEE divide) hash-match regardless of engine
      LineOps.interpolate(lineFixture(s), Seq(0.25, 0.5, 0.75))
    },
    "vector_smooth" -> { (s, _) =>
      // Chaikin corner cutting, 2 rounds: dyadic ¾/¼ weights on integer
      // vertices keep every output coordinate exact — no rounding recipe
      LineOps.chaikin(lineFixture(s), iters = 2)
    },
    "tpch_q10" -> { (s, dir) =>
      // Q10-style returned-item report: filtered big join + broadcast
      // dims, top-20 on a total order, q4 integer money
      Relational.returnedItemReport(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/nation.parquet"))
    },
    "vector_simplify" -> { (s, _) =>
      // fixture-input (sf-independent): 20 LCG-amplitude polylines + 4
      // notched squares with dented holes, Douglas-Peucker at eps 1.0.
      // A pure per-row recursion (fixed split order, first-max ties) —
      // parallelism cannot touch a row's own result, so the oracle is
      // pinned constants (tools/pin_oracle.py flow, like ann_pq)
      import s.implicits._
      val feats = (0 until 20).map { id =>
        val pts = (0 until 10).map { i =>
          val amp = ((id * 31 + i * 17) % 13) - 6
          s"$i $amp"
        }.mkString("LINESTRING (", ", ", ")")
        (id.toLong, pts)
      } ++ (20 until 24).map { id =>
        val d = 0.3 + 0.5 * (id - 20) // notch depths straddle eps
        (id.toLong,
          s"POLYGON ((0 0, 10 0, 10 10, 5 ${10 + d}, 0 10, 0 0), " +
            s"(2 2, 6 2, 6 6, 4 ${6 + d}, 2 6, 2 2))")
      }
      graft.ops.VectorOps.simplify(feats.toDF("fid", "wkt"), "fid", "wkt", eps = 1.0)
    },
    "web_links" -> { (s, dir) =>
      // link-graph construction: synthesize pages whose bodies carry the
      // SAME two host links the web_pagerank fixture uses (plus a
      // no-link case every 11th doc), then harvest hrefs with the
      // codegen'd extractor; the oracle re-runs the identical regex in
      // DuckDB over the identically-built HTML
      val p = Pages.pages(s, dir)
      val l1 = concat(lit("https://host"),
        ((col("doc_id") * 31 + 7) % 97).cast("string"),
        lit(".example/a"), col("doc_id").cast("string"))
      val l2 = concat(lit("https://host"),
        ((col("doc_id") * 17 + 3) % 97).cast("string"),
        lit(".example/b"), col("doc_id").cast("string"))
      val anchors = when(col("doc_id") % 11 === 0, lit(""))
        .otherwise(concat(lit("<a class=\"nav\" href=\""), l1,
          lit("\">one</a><img src=\"skip.png\"/><a href=\""), l2,
          lit("\">two</a>")))
      val html = concat(lit("<!DOCTYPE html><html><head><title>t</title></head><body><p>"),
        col("text"), lit("</p>"), anchors, lit("</body></html>"))
      WebOps.extractLinks(p.select(col("doc_id"), html.as("html")), "html")
    },
    "web_anchors" -> { (s, dir) =>
      // (href, anchor text) pairs per page: COLLIDING targets (no doc
      // suffix, so ~97 hosts each draw many inlinks) and vocab-keyed
      // anchor texts; the oracle replays the same two-group regex in
      // DuckDB, zipping the parallel group extractions positionally
      WebOps.extractAnchors(anchorFixture(s, dir), "html")
    },
    "web_anchor_terms" -> { (s, dir) =>
      // anchor-term index over the same fixture: top-3 terms per target
      // by (count desc, term asc) — the boilerplate anchors ("click
      // here", "home page") dominate each host's index deterministically
      WebOps.anchorTermIndex(
        WebOps.extractAnchors(anchorFixture(s, dir), "html"), k = 3)
    },
    "text_inverted" -> { (s, dir) =>
      // inverted index with exact df and a deterministic postings cap;
      // flattened to scalars (tok, df, slot, doc_id) for the oracle —
      // slot is the 0-based position in the ascending postings array
      TextOps.invertedIndex(documentsOf(s, dir), minDf = 2, maxPostings = 8)
        .select(col("tok"), col("df"),
          posexplode(col("postings")).as(Seq("slot", "doc_id")))
    },
    "web_robots" -> { (s, dir) =>
      // robots-compliance sweep: per-host robots.txt synthesized with a
      // named-agent group (must be ignored), a star group holding a
      // disallow + a LONGER allow carve-out, and an empty disallow
      // (matches nothing). Real parse (windowed group assignment) +
      // longest-match decision, both fully SQL-mirrored.
      val p = Pages.pages(s, dir)
      val hosts = p.select(
        WebOps.hostOf(WebOps.normalizeUrl(col("url"))).as("host")).distinct()
      val k = regexp_extract(col("host"), "^host([0-9]+)\\.", 1).cast("long")
      val robots = hosts.select(col("host"), concat(
        lit("User-Agent: megabot\nDisallow: /\n\nUser-Agent: *\nDisallow: /"),
        (k % 10).cast("string"),
        lit("\nAllow: /"), (k % 10).cast("string"), (k % 7).cast("string"),
        lit("\nDisallow:")).as("robots_txt"))
      WebOps.robotsFilter(p.select("doc_id", "url"), WebOps.parseRobots(robots))
    },
    "web_adjacency" -> { (s, dir) =>
      // WebGraph/BV gap compression accounting over the host link graph
      // (zigzag first successor + LEB128 gaps): ONE exchange on src
      // (dedup + lag window + sum share it); AdjacencySpec proves the
      // real byte codec produces exactly these lengths
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      WebOps.adjacencyCompress(e1.unionByName(e2))
    },
    "web_adjacency_rice" -> { (s, dir) =>
      // Rice-coded posting accounting over the same gap frame:
      // k = floor(log2(mean gap)) per source via the shared generated
      // CASE recipe, exact bit totals, varint bytes alongside — the
      // codec-selection table for a posting-list format
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      WebOps.adjacencyRice(e1.unionByName(e2))
    },
    "web_pagerank" -> { (s, dir) =>
      // host-graph PageRank on a deterministic synthetic link graph
      // (each page emits two host→host links keyed on doc_id); exact
      // integer fixed-point, so the unrolled DuckDB CTE chain is a
      // bit-identical mirror of all 5 distributed iterations
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      WebOps.pageRank(e1.unionByName(e2), iters = 5)
    },
    "web_pagerank_weighted" -> { (s, dir) =>
      // weighted PageRank: rank splits proportionally to edge weight
      // (anchor multiplicity); parallel edges pre-collapse by weight sum
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"),
        (lit(1) + col("doc_id") % 5).as("w"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"),
        (lit(1) + col("doc_id") % 3).as("w"))
      WebOps.pageRankWeighted(e1.unionByName(e2), iters = 5)
    },
    "web_crawl_priority" -> { (s, dir) =>
      // frontier scheduling: exact fixed-point PageRank x host page
      // count, top-20 on a total order
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      val pages = d.groupBy((col("doc_id") % 97).as("host"))
        .agg(count(lit(1)).as("n_pages"))
      WebOps.crawlPriority(e1.unionByName(e2), pages)
    },
    "orders_pareto" -> { (s, dir) =>
      // revenue-concentration curve at exact decile boundaries
      Relational.paretoCurve(s.read.parquet(s"$dir/orders.parquet"))
    },
    "text_burstiness" -> { (s, dir) =>
      // Church-Gale VMR: exact integer second moments, top-20 bursty
      TextOps.burstiness(documentsOf(s, dir))
    },
    "text_vocab_growth" -> { (s, dir) =>
      // Heaps curve at doubling prefixes via first-occurrence min —
      // exact with no ordered scan
      TextOps.vocabGrowth(documentsOf(s, dir))
    },
    "orders_ltv" -> { (s, dir) =>
      // cohort LTV triangle: integer months, q4 money, one window + agg
      Relational.cohortLtv(s.read.parquet(s"$dir/orders.parquet"))
    },
    "web_ball_profile" -> { (s, dir) =>
      // per-node ball-size curve (the closeness/harmonic centrality
      // artifact): exact integer register counts per (host, t)
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      WebOps.ballProfile(e1.unionByName(e2), rounds = 2, p = 9,
        family = "md5prefix")
    },
    "web_hyperball" -> { (s, dir) =>
      // HyperBall neighborhood function on the same host graph: per-node
      // HLL ball sketches grown 3 rounds (register state O(n·m), never
      // all-pairs BFS), summarized per t as exact integer registers —
      // the oracle unrolls the identical register-max rounds in SQL
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      WebOps.neighborhoodFunction(e1.unionByName(e2), rounds = 3, p = 9,
        family = "md5prefix")
    },
    "web_crawl_delay" -> { (s, dir) =>
      // star-group Crawl-delay harvest: a named-agent group's delay (99)
      // must NOT count, an invalid value inside the star group drops via
      // try_cast, two valid star directives take the max, fractional
      // values parse exactly
      val p = Pages.pages(s, dir)
      val hosts = p.select(
        WebOps.hostOf(WebOps.normalizeUrl(col("url"))).as("host")).distinct()
      val k = regexp_extract(col("host"), "^host([0-9]+)\\.", 1).cast("long")
      val robots = hosts.select(col("host"), concat(
        lit("User-Agent: megabot\nCrawl-delay: 99\n\nUser-Agent: *\n"),
        lit("Disallow: /x\nCrawl-Delay: "), (k % 7).cast("string"),
        when(k % 2 === 0,
          concat(lit("\ncrawl-delay: "), (k % 5).cast("string"), lit(".5")))
          .otherwise(lit("")),
        when(k % 3 === 0, lit("\nCrawl-delay: soon")).otherwise(lit("")))
        .as("robots_txt"))
      WebOps.crawlDelays(robots)
    },
    "web_sitemaps" -> { (s, dir) =>
      // group-independent Sitemap harvest: directives above, inside, and
      // after UA groups (all must surface), mixed case, a lookalike
      // directive (sitemapfoo:) and an empty value (both dropped)
      val p = Pages.pages(s, dir)
      val hosts = p.select(
        WebOps.hostOf(WebOps.normalizeUrl(col("url"))).as("host")).distinct()
      val k = regexp_extract(col("host"), "^host([0-9]+)\\.", 1).cast("long")
      val robots = hosts.select(col("host"), concat(
        lit("Sitemap: https://"), col("host"), lit("/s"), (k % 3).cast("string"),
        lit(".xml\nUser-Agent: *\nDisallow: /x\nsitemapfoo: junk\n"),
        when(k % 2 === 0,
          concat(lit("sitemap: https://"), col("host"), lit("/alt.xml\n")))
          .otherwise(lit("")),
        lit("Sitemap:\nSitemap: https://"), col("host"), lit("/last.xml"))
        .as("robots_txt"))
      WebOps.sitemaps(robots)
    },
    "web_scc_seed" -> { (s, dir) =>
      // bounded-hop SCC membership around seed host 0 (8 hops covers
      // the fixture's eccentricity both ways); forward ∩ backward
      // frontier BFS with both hop distances
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      val seeds = d.sparkSession.range(1).select(lit(0L).as("host"))
      WebOps.sccOfSeed(e1.unionByName(e2), seeds, maxHops = 8)
    },
    "web_cocite" -> { (s, dir) =>
      // co-citation over a 3-family host graph (29 hosts, out-degree up
      // to 3); capPerSource=2 is LIVE (out-degree-3 sources are
      // deterministically trimmed to their two lowest targets) and the
      // oracle mirrors the cap exactly — cap semantics are part of the
      // contract, not a fuzzy heuristic
      val d = documentsOf(s, dir)
      val fams = Seq((31L, 7L), (17L, 3L), (23L, 11L)).map { case (p, q) =>
        d.select((col("doc_id") % 29).as("src"),
          ((col("doc_id") * p + q) % 29).as("dst"))
      }
      WebOps.cocitationPairs(fams.reduce(_ unionByName _),
        minShared = 1, capPerSource = 2)
    },
    "web_trustrank" -> { (s, dir) =>
      // TrustRank on the same deterministic host graph as web_pagerank,
      // seeds = hosts divisible by 13; exact integer fixed-point, so
      // the unrolled seeded-teleport CTE chain mirrors bit-identically.
      // Hosts unreachable from every seed must land at exactly 0.
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      val edges = e1.unionByName(e2)
      val seeds = edges.select(col("src").as("host"))
        .unionByName(edges.select(col("dst").as("host")))
        .filter(col("host") % 13 === 0).distinct()
      WebOps.trustRank(edges, seeds, iters = 5)
    },
    "web_spam_mass" -> { (s, dir) =>
      // (PR − TR)/PR in sign-explicit ppm — same graph/seeds/iters as
      // web_pagerank + web_trustrank; the link-farm shortlist metric
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      val edges = e1.unionByName(e2)
      val seeds = edges.select(col("src").as("host"))
        .unionByName(edges.select(col("dst").as("host")))
        .filter(col("host") % 13 === 0).distinct()
      WebOps.spamMass(edges, seeds, iters = 5)
    },
    "web_spamrank" -> { (s, dir) =>
      // Anti-TrustRank (spam mass, Krishnan & Raj 2006): badness
      // propagates BACKWARD from known-spam seeds — a host linking into
      // spam inherits spam mass — which is exactly trustRank over the
      // REVERSED edge set. Seeds = hosts divisible by 11, 4 iterations.
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      val rev = e1.unionByName(e2)
        .select(col("dst").as("src"), col("src").as("dst"))
      val seeds = rev.select(col("src").as("host"))
        .unionByName(rev.select(col("dst").as("host")))
        .filter(col("host") % 11 === 0).distinct()
      WebOps.trustRank(rev, seeds, iters = 4)
    },
    "web_lpa" -> { (s, dir) =>
      // synchronous label propagation (3 rounds, min-label tie-break)
      // over the symmetrized 997-host graph — denser communities than
      // plain connectivity; oracle unrolls the same three rounds
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 997).as("src"),
        ((col("doc_id") * 31 + 7) % 997).as("dst"))
      val e2 = d.select((col("doc_id") % 997).as("src"),
        ((col("doc_id") * 17 + 3) % 997).as("dst"))
      WebOps.lpaCommunities(e1.unionByName(e2), rounds = 3)
    },
    "web_modularity" -> { (s, dir) =>
      // Newman modularity of the 3-round LPA partition over the same
      // 997-host graph: one exact-integer certificate row (q_ppm
      // truncate-toward-zero); oracle = the LPA CTE chain + the same
      // integer fold
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 997).as("src"),
        ((col("doc_id") * 31 + 7) % 997).as("dst"))
      val e2 = d.select((col("doc_id") % 997).as("src"),
        ((col("doc_id") * 17 + 3) % 997).as("dst"))
      val edges = e1.unionByName(e2)
      WebOps.modularity(edges, WebOps.lpaCommunities(edges, rounds = 3))
    },
    "web_bowtie" -> { (s, dir) =>
      // bow-tie decomposition around seeds = hosts % 29 == 0, hop budget
      // 8: core/in/out/other per host with both hop distances. The
      // oracle runs two 8-round min-hop relaxation chains (forward +
      // reversed) and classifies with the same CASE.
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      val edges = e1.unionByName(e2)
      val seeds = edges.select(col("src").as("host"))
        .unionByName(edges.select(col("dst").as("host")))
        .filter(col("host") % 29 === 0).distinct()
      WebOps.bowtie(edges, seeds, maxHops = 8)
    },
    "web_assortativity" -> { (s, dir) =>
      // directed out-in degree assortativity of the host graph as exact
      // integer certificates (r² in signed ppm; sqrt never evaluated)
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      WebOps.degreeAssortativity(e1.unionByName(e2))
    },
    "web_reach" -> { (s, dir) =>
      // frontier BFS from seed host 0 on the deterministic host graph,
      // capped at 6 hops (the graph's eccentricity from 0 is 8, so the
      // cap is LIVE: hosts at hops 7-8 must be absent). Exact min-hop
      // semantics mirror a 6-round relaxation CTE.
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      val seeds = d.sparkSession.range(1).select(lit(0L).as("host"))
      WebOps.reachable(e1.unionByName(e2), seeds, maxHops = 6)
    },
    "web_hits" -> { (s, dir) =>
      // HITS on the same deterministic host graph as web_pagerank: two
      // exact alternating-walk-count rounds, cast long for the oracle
      // (fixture counts are far below 2^63; the operator keeps
      // decimal(38,0))
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + 7) % 97).as("dst"))
      val e2 = d.select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 17 + 3) % 97).as("dst"))
      WebOps.hits(e1.unionByName(e2), iters = 2)
        .select(col("node"), col("hub").cast("long").as("hub"),
          col("auth").cast("long").as("auth"))
    },
    "crawl_diff" -> { (s, dir) =>
      // two overlapping synthetic crawls over 150 URLs: before covers
      // m<120, after covers m>=30 (30 removed, 30 added), every 5th
      // common page gains a " v2" suffix in the after-crawl (changed),
      // every 3rd serves pinned content (unchanged); both sides carry
      // multiple fetches so the latest-wins collapse is live
      val p = Pages.pages(s, dir)
      val m = col("doc_id") % 150
      val content = when(m % 3 === 0,
        concat(lit("c"), m.cast("string"))).otherwise(col("text"))
      val base = p.select(col("doc_id"),
        concat(lit("https://crawl.example/p"), m.cast("string")).as("url"),
        col("warc_sec"), content.as("text"), m.as("m"))
      val before = base.filter(col("m") < 120).drop("m")
      val after = base.filter(col("m") >= 30)
        .select(col("doc_id"), col("url"), col("warc_sec"),
          concat(col("text"),
            when(col("m") % 5 === 0, lit(" v2")).otherwise(lit(""))).as("text"))
      WebOps.snapshotDiff(before, after)
    },
    "web_dup_report" -> { (s, dir) =>
      // plant per-host duplication: every 3rd page of a host serves the
      // host's template text, the rest stay unique — dup_ppm is live and
      // varies by host size
      val p = Pages.pages(s, dir)
      val k = (col("doc_id") % 97).cast("string")
      val t = when(col("doc_id") % 3 === 0,
        concat(lit("template-"), k)).otherwise(col("text"))
      WebOps.hostDupReport(p.select(col("doc_id"), col("url"), t.as("text")))
    },
    "url_features" -> { (s, dir) =>
      // richer synthetic URLs: section segment, per-rule .html leaf or
      // bare numeric slug, query string on every 4th page — every
      // feature column takes both branches
      val p = Pages.pages(s, dir)
      val k = (col("doc_id") % 97).cast("string")
      val d = col("doc_id").cast("string")
      val url2 = concat(
        lit("https://host"), k, lit(".example/sec"),
        (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 3 === 0, concat(lit("/page"), d, lit(".html")))
          .otherwise(concat(lit("/"), d)),
        when(col("doc_id") % 4 === 0, lit("?ref=rss")).otherwise(lit("")))
      WebOps.urlFeatures(p.select(col("doc_id"), url2.as("url")))
    },
    "url_change_rate" -> { (s, dir) =>
      // recrawl churn over 100 synthetic URLs (5 fetches each at
      // sf0.001): every 3rd page serves pinned content (0 changes), the
      // rest serve the per-fetch document text (changes on every
      // distinct refetch)
      val p = Pages.pages(s, dir)
      val m = col("doc_id") % 100
      val content = when(m % 3 === 0,
        concat(lit("stable-"), m.cast("string"))).otherwise(col("text"))
      WebOps.urlChangeRate(p.select(
        concat(lit("https://crawl.example/p"), m.cast("string")).as("url"),
        col("warc_sec"), content.as("text")))
    },
    "url_hll_regs" -> { (s, dir) =>
      // HyperLogLog register table (p=9, md5prefix oracle family) of
      // distinct normalized URLs per lang — the mergeable sketch artifact
      // itself, bit-exact because registers are pure hash-derived maxima
      val p = Pages.pages(s, dir)
      val n = p.select(col("lang"),
        WebOps.normalizeUrl(col("url")).as("nurl"))
      Sketches.hllRegisters(n, "nurl", Seq("lang"), p = 9,
        family = "md5prefix")
    },
    "url_host_hll" -> { (s, dir) =>
      // integer HLL summary per lang (occupied registers, zeros, exact
      // integer indicator zint = 2^52·Z) — the estimate is one division
      // away but stays out of the hash-checked artifact
      val p = Pages.pages(s, dir)
      val n = p.select(col("lang"),
        WebOps.normalizeUrl(col("url")).as("nurl"))
      Sketches.hllSummary(
        Sketches.hllRegisters(n, "nurl", Seq("lang"), p = 9,
          family = "md5prefix"),
        Seq("lang"), p = 9)
    },
    "url_kmv" -> { (s, dir) =>
      // KMV bottom-k distinct sketch (k=16, md5prefix oracle family) of
      // normalized URLs per lang — registers double as a uniform key
      // sample; bottom-k of a set is order-free, so rows are bit-exact
      val p = Pages.pages(s, dir)
      val n = p.select(col("lang"), WebOps.normalizeUrl(col("url")).as("nurl"))
      Sketches.kmvRegisters(n, "nurl", Seq("lang"), k = 16, family = "md5prefix")
    },
    "url_kmv_est" -> { (s, dir) =>
      // the KMV estimate is itself exact integer arithmetic —
      // ⌊(k−1)·2^60 / h_(k)⌋, or the exact count when the group holds
      // fewer than k distinct keys — so unlike HLL the ESTIMATE is in
      // the hash-checked artifact
      val p = Pages.pages(s, dir)
      val n = p.select(col("lang"), WebOps.normalizeUrl(col("url")).as("nurl"))
      Sketches.kmvEstimate(
        Sketches.kmvRegisters(n, "nurl", Seq("lang"), k = 16, family = "md5prefix"),
        Seq("lang"), k = 16)
    },
    "web_langmix" -> { (s, dir) =>
      // per-host language Gini over the natural (host, lang) mix of the
      // corpus — hosts hold several pages across the 5 langs, so the
      // impurity spans [0, ~0.8] and the exact integer ppm is live
      WebOps.hostLangMix(Pages.pages(s, dir))
    },
    "web_templates" -> { (s, dir) =>
      // the html_meta head-variant corpus collapses onto the 2×2×2
      // template lattice; fingerprints group by opening-tag sequence only
      val p = Pages.pages(s, dir)
      val d = col("doc_id").cast("string")
      val head = concat(
        lit("<html><head><title>Page "), d, lit("</title>"),
        when(col("doc_id") % 2 === 0, concat(
          lit("<meta name=\"description\" content=\"desc "), d, lit("\"/>")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0, concat(
          lit("<link rel=\"canonical\" href=\"https://canon.example/"),
          (col("doc_id") % 50).cast("string"), lit("\"/>")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 =!= 0, lit("<meta charset=\"utf-8\"/>"))
          .otherwise(lit("")),
        lit("</head><body>"), substring(col("text"), 1, 30),
        lit("</body></html>"))
      WebOps.templateTable(p.select(col("doc_id"),
        encode(head, "UTF-8").as("html")))
    },
    "web_redirects" -> { (s, dir) =>
      // 20 blocks of 10 URLs: normal blocks chain 0→1→…→9 (chains up to
      // 9 hops, terminal at 9); every 4th block is a planted 10-cycle
      // that must come back status=cycle_or_long with final/hops NULL
      val d = documentsOf(s, dir)
      val m = col("doc_id") % 200
      val block = expr("(doc_id % 200) div 10")
      val dstm = when(block % 4 === 3, block * 10 + (m % 10 + 1) % 10)
        .when(m % 10 < 9, m + 1)
      WebOps.resolveRedirects(d.select(
        concat(lit("https://r.example/"), m.cast("string")).as("src"),
        when(dstm.isNotNull,
          concat(lit("https://r.example/"), dstm.cast("string"))).as("dst")),
        maxHops = 16)
    },
    "html_meta" -> { (s, dir) =>
      // head variants: description on even docs, canonical on every 3rd,
      // charset missing on every 5th — all four extracts live, absent
      // fields must surface as ''
      val p = Pages.pages(s, dir)
      val d = col("doc_id").cast("string")
      val head = concat(
        lit("<html><head><title>Page "), d, lit("</title>"),
        when(col("doc_id") % 2 === 0, concat(
          lit("<meta name=\"description\" content=\"desc "), d, lit("\"/>")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0, concat(
          lit("<link rel=\"canonical\" href=\"https://canon.example/"),
          (col("doc_id") % 50).cast("string"), lit("\"/>")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 =!= 0, lit("<meta charset=\"utf-8\"/>"))
          .otherwise(lit("")),
        lit("</head><body>"), substring(col("text"), 1, 30),
        lit("</body></html>"))
      WebOps.htmlMeta(p.select(col("doc_id"),
        encode(head, "UTF-8").as("html")))
    },
    "web_reciprocity" -> { (s, dir) =>
      // 3 organic families + a planted reverse of family 1 on every 4th
      // doc: 194 reciprocal directed edges, so per-host n_recip spans
      // the live range instead of degenerating to zeros
      val d = documentsOf(s, dir)
      val fams = Seq((31L, 7L), (17L, 3L), (23L, 11L)).map { case (p, q) =>
        d.select((col("doc_id") % 97).as("src"),
          ((col("doc_id") * p + q) % 97).as("dst"))
      }
      val planted = d.filter(col("doc_id") % 4 === 0)
        .select(((col("doc_id") * 31 + 7) % 97).as("src"),
          (col("doc_id") % 97).as("dst"))
      WebOps.reciprocity((fams :+ planted).reduce(_ unionByName _))
    },
    "web_host_quality" -> { (s, dir) =>
      // Wilson lower-bound gate at τ=1/2, z=1.96: hosts hold ~5 pages at
      // sf0.001 so the small-sample correction is the whole story (5/5
      // good passes, 4/5 fails — a raw-rate gate would pass both)
      val p = Pages.pages(s, dir)
      WebOps.hostQualityGate(p.select(
        WebOps.hostOf(WebOps.normalizeUrl(col("url"))).as("host"),
        (col("doc_id") % 4 =!= 0).as("good")))
    },
    "web_kcore" -> { (s, dir) =>
      // 5-core of the 3-family host graph: peeling is LIVE (two
      // simultaneous rounds remove 5 hosts) and the surviving 92-node
      // core is non-trivial
      val d = documentsOf(s, dir)
      val fams = Seq((31L, 7L), (17L, 3L), (23L, 11L)).map { case (p, q) =>
        d.select((col("doc_id") % 97).as("src"),
          ((col("doc_id") * p + q) % 97).as("dst"))
      }
      WebOps.kCore(fams.reduce(_ unionByName _), k = 5)
    },
    "web_components" -> { (s, dir) =>
      // connected components of a sparse 997-host graph via the same
      // alternating star contraction that powers dedup_clusters — the
      // mirror-site / link-farm grouping primitive; component id = min
      // member, matching the oracle's transitive-closure min
      val d = documentsOf(s, dir)
      val e1 = d.select((col("doc_id") % 997).as("src"),
        ((col("doc_id") * 31 + 7) % 997).as("dst"))
      val e2 = d.select((col("doc_id") % 997).as("src"),
        ((col("doc_id") * 17 + 3) % 997).as("dst"))
      Dedup.connectedComponents(e1.unionByName(e2))
    },
    "web_triangles" -> { (s, dir) =>
      // degree-ordered triangle counting over the 3-family undirected
      // host graph (19 triangles at sf0.001 — enough that per-node
      // counts, zero-triangle nodes, and the orientation tie-break are
      // all exercised)
      val d = documentsOf(s, dir)
      val fams = Seq((31L, 7L), (17L, 3L), (23L, 11L)).map { case (p, q) =>
        d.select((col("doc_id") % 97).as("src"),
          ((col("doc_id") * p + q) % 97).as("dst"))
      }
      WebOps.triangleCounts(fams.reduce(_ unionByName _))
    },
    "web_boilerplate" -> { (s, dir) =>
      // host-level boilerplate line removal at threshold 1/2: every page
      // of host k carries the host's header plus the cross-host footer
      // (both 100% — dropped), a "promo line" on even doc_ids only
      // (~half of each host's pages, so the integer threshold test is
      // LIVE on odd-sized hosts), and two unique lines that must survive
      // byte-identically in document order
      val p = Pages.pages(s, dir)
      val k = (col("doc_id") % 97).cast("string")
      val boilered = concat(
        lit("(c) host"), k, lit(" header\n"),
        lit("body "), col("doc_id").cast("string"), lit("\n"),
        when(col("doc_id") % 2 === 0, lit("promo line\n")).otherwise(lit("")),
        substring(col("text"), 1, 40),
        lit("\nfooter common"))
      WebOps.stripBoilerplate(
        p.select(col("doc_id"), col("url"), boilered.as("text")),
        fracNum = 1, fracDen = 2, minHostDocs = 2)
    },
    "text_lm_score" -> { (s, dir) =>
      // stupid-backoff bigram LM: reference = every 10th document,
      // scored = the whole corpus (so in-reference docs score high and
      // the backoff + OOV paths are exercised by the rest)
      val d = documentsOf(s, dir)
      TextOps.lmScore(d, d.filter(col("doc_id") % 10 === 0))
    },
    "text_soundex" -> { (s, _) =>
      // American Soundex (NARA H/W rule) as ONE generated SQL expression
      // shared verbatim with the oracle — translate + chained replace,
      // no regex, no UDF, map-only codegen; published vectors pinned in
      // SoundexSpec
      TextOps.soundexKey(soundexNamesDf(s), "name")
    },
    "text_soundex_pairs" -> { (s, _) =>
      // phonetic-blocked linkage candidates: equi-join on the soundex
      // key (never all-pairs), id-ordered — the record-linkage blocking
      // pattern with exact verifiers composing downstream
      TextOps.soundexPairs(soundexNamesDf(s), "name_id", "name")
    },
    "text_heavy_mg" -> { (s, dir) =>
      // Misra–Gries heavy hitters, k=30: bounded-state candidate
      // prefilter (the merged-summary guarantee of Agarwal et al. 2012
      // keeps every token with count·31 > N) + exact recount where all
      // non-candidates collapse into ONE combiner cell — output is
      // exactly the true heavy set with exact counts, deterministic at
      // any parallelism. Sketch-prefilter + exact-verify, the
      // geo_cover_pip adjudication applied to frequency.
      Sketches.heavyHitters(TextOps.tokenTable(documentsOf(s, dir)), "tok", 30)
    },
    "url_idn" -> { (s, _) =>
      // Punycode/IDNA host normalization (RFC 3492 from scratch,
      // PunySpec cross-validates both directions against java.net.IDN):
      // decode xn-- labels to the display form, re-encode to canonical
      // ACE — map-only, the URL-dedup pre-join step. Pinned-constant
      // oracle (deterministic fixture, the mm_snappy class).
      import s.implicits._
      val hosts = Seq(
        (0L, "xn--mnchen-3ya.de"), (1L, "xn--bcher-kva.example"),
        (2L, "xn--fiqs8s"), (3L, "www.example.com"),
        (4L, "XN--MNCHEN-3YA.DE"), (5L, "xn--80akhbyknj4f.example"),
        (6L, "mixed.xn--caf-dma.shop"), (7L, "xn--nxasmq6b.example"))
        .toDF("host_id", "host")
      graft.ops.Puny.idnTable(hosts, "host")
    },
    "url_ring" -> { (s, dir) =>
      // consistent-hash RING re-sharding audit 10 → 11 shards (8 virtual
      // nodes per shard, plan-time literal ring, pure codegen
      // array_min(filter) successor lookup): the rendezvous alternative;
      // same minimal-movement invariant, spec-pinned
      graft.ops.Scalers.ringMoveAudit(Pages.pages(s, dir), "url", 10, 11)
    },
    "events_gap_quantiles" -> { (s, dir) =>
      // exact inter-event-gap quantiles per type (whole seconds,
      // counting method — the percentile_approx exact counterpart on
      // the gap domain)
      Events.gapQuantiles(s.read.parquet(s"$dir/events.parquet"))
    },
    "url_shards" -> { (s, dir) =>
      // rendezvous (HRW) re-sharding audit 10 → 11 shards: per-shard
      // stay/move accounting; moved keys can ONLY land on the new shard
      // (HRW minimal-movement invariant, spec-pinned). md5prefix oracle
      // family; production default is xxhash64 on the identical plan.
      graft.ops.Scalers.shardMoveAudit(Pages.pages(s, dir), "url", 10, 11, "md5prefix")
    },
    "text_cms" -> { (s, dir) =>
      // Count-Min registers (width 256 × depth 4, md5prefix oracle
      // family) over the global token stream — the mergeable frequency
      // sketch artifact itself
      Sketches.cmsRegisters(TextOps.tokenTable(documentsOf(s, dir)),
        "tok", Seq(), width = 256, depth = 4, family = "md5prefix")
    },
    "text_cms_probe" -> { (s, dir) =>
      // point estimates vs exact counts for every distinct token: est is
      // min-over-depth and never underestimates (the oracle recomputes
      // both sides, so the sketch arithmetic is hash-checked end-to-end)
      val toks = TextOps.tokenTable(documentsOf(s, dir))
      val regs = Sketches.cmsRegisters(toks, "tok", Seq(),
        width = 256, depth = 4, family = "md5prefix")
      val est = Sketches.cmsEstimate(regs, toks.select("tok").distinct(),
        "tok", Seq(), width = 256, depth = 4, family = "md5prefix")
      est.join(toks.groupBy("tok").agg(count(lit(1)).as("exact")), "tok")
    },
    "text_length_quantiles" -> { (s, dir) =>
      // exact per-lang p50/p90/p99 of token counts via the bounded-domain
      // counting method (the exact counterpart to percentile_approx)
      TextOps.lengthQuantiles(documentsOf(s, dir))
    },
    "text_collocations" -> { (s, dir) =>
      // top-50 PMI collocations at minCount=5; the integer score is the
      // monotone core of PMI, so the ranking (and the limit boundary,
      // tie-broken on the pair) is exact
      TextOps.collocations(documentsOf(s, dir), minCount = 5, topK = 50)
    },
    "text_keyphrases" -> { (s, dir) =>
      // RAKE keyphrases: stopword-delimited candidate runs scored by
      // Σ deg(w)/freq(w) in exact integer ppm, top 3 per document
      TextOps.keyphrases(documentsOf(s, dir), topK = 3)
    },
    "events_funnel" -> { (s, dir) =>
      // ordered view→click→purchase funnel, first-touch semantics with
      // exact microsecond reach times and integer conversion ppm
      Events.funnel(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("view", "click", "purchase"))
    },
    "events_attribution" -> { (s, dir) =>
      // last-touch (ever) + first-touch (7-day lookback) attribution per
      // purchase: two window frames over ONE user exchange, never a
      // conversions×touches self-join; revenue as exact integer cents
      Events.attribution(s.read.parquet(s"$dir/events.parquet"))
    },
    "quality_drift" -> { (s, dir) =>
      // exact total-variation drift between doc_id-parity cohorts over
      // bucketed n_chars: per-bucket cross-multiplied imbalance (no
      // per-bucket division — empty-on-one-side buckets need no
      // epsilon), tv_ppm from the exact integer sum
      Quality.drift(
        documentsOf(s, dir).withColumn("cohort", col("doc_id") % 2),
        "n_chars", "cohort", bucketWidth = 16)
    },
    "text_pack" -> { (s, dir) =>
      // 512-token packing manifest; bucket=64 so the distributed
      // prefix-sum path (bucket offsets + local cumsum) actually
      // exercises multiple buckets at sf0.01
      TextOps.packSequences(documentsOf(s, dir), maxTokens = 512, bucket = 64)
    },
    "text_pii" -> { (s, dir) =>
      // plant deterministic PII (email / long number / IPv4) on a subset
      // of documents, then detect + scrub; `clean` proves the scrub
      // leaves no residual matches
      val planted = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example now"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" tel 9"), (col("doc_id") + 100000000L).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
          .otherwise(lit("")))
      TextOps.piiSignals(documentsOf(s, dir).withColumn("text", planted))
    },
    "text_normalize" -> { (s, dir) =>
      // deterministically roughen the corpus (doubled spaces, padded
      // ends, trailing tab) then prove normalizeWs restores it exactly
      val messy = concat(lit("  "), regexp_replace(col("text"), " ", "  "), lit("\t"))
      documentsOf(s, dir).select(col("doc_id"),
        md5(encode(TextOps.normalizeWs(messy), "UTF-8")).as("clean_md5"),
        (TextOps.normalizeWs(messy) === col("text")).as("ok"))
    },

    // north-rule invariant: text reaches the sink byte-identical (hash of the
    // html-encoded carry equals hash of the source text)
    "text_identity" -> { (s, dir) =>
      Pages.pages(s, dir).select(col("url"), md5(col("html")).as("text_md5"))
    },

    // --- deduplication ---
    "dedup_exact" -> { (s, dir) => Dedup.exact(documentsOf(s, dir)) },
    "dedup_minhash_sig" -> { (s, dir) =>
      // md5prefix family: 60-bit-long signatures the DuckDB oracle can
      // reproduce; still a HashAggregate (long min), unlike the r1
      // string-min SortAggregate. Production default is xxhash64.
      Dedup.minhashSignature(documentsOf(s, dir), k = 8, family = "md5prefix")
    },
    "dedup_lsh_pairs" -> { (s, dir) =>
      // incremental-dedup shape: 10% probe batch vs the full corpus
      Dedup.minhashLshPairs(documentsOf(s, dir), k = 8, bands = 4, threshold = 0.5,
        probeFilter = col("doc_id") % 10 === 0, family = "md5prefix")
    },
    "dedup_jaccard_pairs" -> { (s, dir) =>
      Dedup.jaccardSimilarPairs(documentsOf(s, dir), threshold = 0.8,
        probeFilter = col("doc_id") % 10 === 0)
    },
    "dedup_cosine_pairs" -> { (s, dir) =>
      // weighted AllPairs (Bayardo WWW'07): cosine >= 3/5 over integer
      // quantized-idf vectors; the acceptance test is an exact integer
      // certificate, so the plain all-pairs SQL join is a bit mirror
      Dedup.cosineSimilarPairs(documentsOf(s, dir), tNum = 3, tDen = 5,
        probeFilter = col("doc_id") % 10 === 0)
    },
    "dedup_simhash" -> { (s, dir) => Dedup.simhash16(documentsOf(s, dir)) },
    "dedup_contain_pairs" -> { (s, dir) =>
      // asymmetric containment |A∩B|/|A| >= 9/10 (quote/excerpt
      // detection); rational threshold, all-integer certificates; the
      // oracle is the brute-force inverted-index SQL join. 9/10 + the
      // sparser probe keeps the dup-heavy corpus's output bounded (the
      // op is output-bound by construction)
      Dedup.containmentPairs(documentsOf(s, dir), tNum = 9, tDen = 10,
        probeFilter = col("doc_id") % 25 === 0)
    },
    "dedup_simhash_pairs" -> { (s, dir) =>
      // Manku WWW'07: 64-bit simhash + lossless 4x16-bit pigeonhole
      // hamming join at distance <= 3 (md5prefix oracle family; the
      // xxhash64 production default is benched separately). The oracle
      // is the BRUTE-FORCE all-pairs SQL join, so a hash-exact match
      // proves the banded join lossless end-to-end on this corpus.
      Dedup.simhashPairs(documentsOf(s, dir), family = "md5prefix")
    },
    "dedup_minhash_shingles" -> { (s, dir) =>
      // 3-gram shingle MinHash: same signature machinery over the
      // shingle alphabet (md5prefix family for the oracle)
      Dedup.minhashSignatureFrom(
        Dedup.shingleTable(documentsOf(s, dir), n = 3).distinct(),
        k = 8, family = "md5prefix")
    },
    "dedup_clusters" -> { (s, dir) =>
      // full-corpus near-dup clustering: bucket-star edges + alternating
      // large/small-star connected components (never quadratic in bucket
      // size); md5prefix family so DuckDB mirrors the band keys
      Dedup.lshClusters(documentsOf(s, dir), k = 8, bands = 4, family = "md5prefix")
    },
    "dedup_calibration" -> { (s, dir) =>
      // sketch-tuning measurement: signature-estimated vs exact Jaccard
      // (both integer ppm) for every banding candidate — the table you
      // read before committing K/bands for the 10^12-doc job
      Dedup.sketchCalibration(documentsOf(s, dir), k = 8, bands = 4,
        family = "md5prefix")
    },
    "dedup_cluster_keep" -> { (s, dir) =>
      // retention policy over the clusters: keep the densest member per
      // near-dup cluster (ties → lowest doc_id)
      Dedup.clusterCanonical(documentsOf(s, dir), k = 8, bands = 4, family = "md5prefix")
    },
    "dedup_bloom" -> { (s, dir) =>
      // incremental-crawl membership: reference corpus = doc_id % 3,
      // probe = everything; the bitmap probe itself runs (codegen'd bit
      // test), and the oracle mirrors it through set semantics — bitmap
      // OR is set union, so "all k bits set" is exactly "all k positions
      // in the distinct reference position set"
      val docs = documentsOf(s, dir)
      Dedup.bloomFlags(docs, docs.filter(col("doc_id") % 3 === 0),
        k = 5, mBits = 1 << 20, family = "md5prefix")
    },

    // --- similarity search ---
    "ann_topk" -> { (s, dir) => Similarity.annTopK(embeddingsOf(s, dir), probeMaxId = 50, k = 5) },
    "ml_centroid" -> { (s, dir) =>
      // nearest-centroid (Rocchio) eval: exact rational class centroids
      // (coordinate sums + counts, never divided), cross-multiplied
      // Decimal dominance argmin, ties to the lower label
      Similarity.centroidClassifyEval(embeddingsOf(s, dir), testMod = 10)
    },
    "ml_knn" -> { (s, dir) =>
      // kNN classifier eval: vec_id % 10 = 0 held out, exact integer
      // squared-L2 on milli-quantized vectors, 5-NN majority vote with
      // total-order ties ((dist, id) then (votes desc, label asc)) —
      // bit-stable at any parallelism; test side broadcast, train side
      // never shuffles (the annTopK probe pattern)
      Similarity.knnClassifyEval(embeddingsOf(s, dir), k = 5, testMod = 10)
    },
    "emb_quantize" -> { (s, dir) =>
      // SQ8 codes + per-vector scale, exploded to (vec_id, dim, code)
      // rows so every code byte is hash-checked
      Similarity.sq8Quantize(embeddingsOf(s, dir))
        .select(col("vec_id"), col("scale"),
          posexplode(col("codes")).as(Seq("dim", "code")))
    },
    "ann_sq8" -> { (s, dir) =>
      Similarity.annSq8(embeddingsOf(s, dir), probeMaxId = 50, k = 5)
    },
    "ann_ivf" -> { (s, dir) =>
      // IVF with nprobe = nlist: the full machinery (k-means training,
      // cell assignment, probe expansion, cell equi-join) runs on the
      // oracle-checked path, and full probing makes it exactly brute
      // force — same oracle as ann_topk. Partial-probe recall: IvfSpec.
      Similarity.ivfTopK(embeddingsOf(s, dir), probeMaxId = 50, k = 5,
        nlist = 8, nprobe = 8, iters = 2)
    },
    "ann_cosine_baseline" -> { (s, dir) => Similarity.cosineTopK(embeddingsOf(s, dir), probeMaxId = 20, k = 5) },
    "ann_pq" -> { (s, _) =>
      // IVF-PQ: full machinery (distributed Lloyd training + map-only ADC
      // scan) on a pinned codeword-aligned fixture — 200 dim-8 integer
      // vectors whose m=4 subspaces each take one of 16 planted values, so
      // training is deterministic at any parallelism (PqSpec) and the
      // top-k is a pinned constant table (hash-exact oracle; VERDICT r4
      // #5 — was rows-only). Corpus-scale approximate recall stays pinned
      // in PqSpec's planted-cluster test.
      import s.implicits._
      val emb = s.range(200).map { id =>
        val v = (0 until 4).flatMap { sub =>
          val c = ((id * 7 + sub * 3 + id / 16) % 16).toInt
          Seq(c.toFloat, (15 - c).toFloat)
        }
        (id, v)
      }.toDF("vec_id", "embedding")
      val books = Similarity.pqCodebooks(emb, m = 4, ksub = 16, iters = 2)
      Similarity.pqTopK(emb, probeMaxId = 8, k = 3, books)
        .orderBy("query_id", "rank")
    },
    "ann_lsh" -> { (s, dir) =>
      Similarity.lshBucketTopK(embeddingsOf(s, dir), numPlanes = 16, k = 5,
        bands = 2, capPerBucket = 128)
    },
    "ann_recall" -> { (s, dir) =>
      // index-quality harness: recall@5 of the LSH path vs the exact
      // top-5 on the 50-probe set, exact integer ppm
      Similarity.recallEval(embeddingsOf(s, dir), probeMaxId = 50,
        numPlanes = 16, k = 5)
    },
    "emb_dup_pairs" -> { (s, dir) =>
      // embedding-cosine near-dup: LSH candidates + exact quantized-cosine
      // verify (threshold 0.3 fits the synthetic corpus — no planted
      // near-identical vectors, max pair cosine ≈ 0.51)
      Similarity.cosineDupPairs(embeddingsOf(s, dir), threshold = 0.3,
        numPlanes = 16, bands = 2, capPerBucket = 128)
    },

    "emb_clusters" -> { (s, dir) =>
      // SemDeDup end-to-end: the cosine near-dup pairs above feed the
      // same star-contraction CC that powers dedup_clusters; every
      // embedding gets its semantic cluster id (= min member),
      // singletons keep themselves
      val emb = embeddingsOf(s, dir)
      val pairs = Similarity.cosineDupPairs(emb, threshold = 0.3,
          numPlanes = 16, bands = 2, capPerBucket = 128)
        .select(col("vec_a").as("src"), col("vec_b").as("dst"))
      val cc = Dedup.connectedComponents(pairs)
      emb.select(col("vec_id"))
        .join(cc, col("vec_id") === col("node"), "left")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("cluster"))
    },

    "events_anomaly" -> { (s, dir) =>
      // trailing-24h rate-spike detection per event type: exact integer
      // spike ppm over a RANGE frame on the integer hour (missing hours
      // weigh zero without gap-filling)
      Events.hourlyAnomaly(eventsOf(s, dir), windowHours = 24)
    },
    "events_bots" -> { (s, dir) =>
      // bot cadence: exact inter-event gap VMR per user; regular
      // (scheduler-like) verdict below the threshold
      Events.botCadence(eventsOf(s, dir))
    },
    "events_forecast" -> { (s, dir) =>
      // seasonal-naive baseline error: period shift as a self-join (a
      // window lag would read across sparse-hour gaps), exact |err| sums
      Events.seasonalNaiveError(eventsOf(s, dir))
    },
    "events_json" -> { (s, dir) =>
      // schema-on-read: typed JSON property extraction + per-type rollup
      Events.jsonPropStats(eventsOf(s, dir))
    },
    "events_abtest" -> { (s, dir) =>
      // two-proportion chi-square as an exact (num, den) certificate,
      // verdict by cross-multiplication at alpha = 0.05
      Events.abTest(eventsOf(s, dir))
    },
    "events_scd2" -> { (s, dir) =>
      // SCD2 dimension build: per-user event_type change intervals with
      // (ts, event_id) tie order; consecutive-duplicate collapse + lead
      // + version on one exchange
      Events.scd2(eventsOf(s, dir), "user_id", "ts", "event_type", "event_id")
    },
    "events_rollup" -> { (s, dir) =>
      // hour-of-day x type ROLLUP with sentinel group markers
      Events.hourTypeRollup(eventsOf(s, dir))
    },
    "events_cusum" -> { (s, dir) =>
      // Page's CUSUM as a closed window form (running sum + running min
      // on one exchange) — no sequential recursion, exact integers
      Events.cusum(eventsOf(s, dir), k = 1, h = 5)
    },
    "events_asof" -> { (s, dir) =>
      // as-of join: each error picks up the user's latest purchase at or
      // before it — UNION + one window, no join (AsofJoin.scala); the
      // oracle is DuckDB's NATIVE ASOF LEFT JOIN, so a hash match
      // certifies the windowed composition against an independent
      // first-class implementation of the operator
      val ev = eventsOf(s, dir)
      val probe = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      val build = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(struct(col("event_id"), col("value"))).as("s"))
        .select(col("user_id"), col("ts").as("b_ts"),
          col("s.event_id").as("b_event_id"), col("s.value").as("b_value"))
        .withColumn("ts", col("b_ts"))
      AsofJoin.asofJoin(probe, build, Seq("user_id"), "ts",
          Seq("b_event_id", "b_ts", "b_value"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("asof_b_event_id").as("asof_event_id"),
          col("asof_b_ts").as("asof_ts"),
          col("asof_b_value").as("asof_value"))
    },

    "events_copresence" -> { (s, dir) =>
      // self interval-overlap join over gap-rule sessions: bucket-explode
      // equi-join, pair emitted only from the overlap-start bucket (dedup
      // rides the join); brute-force oracle certifies losslessness
      Events.copresencePairs(eventsOf(s, dir))
    },

    // --- resampling variants / robust slope / DEM / more hood methods ---
    "raster_overviews" -> { (s, _) =>
      // COG overview chain: 4 successive 2x average reductions, each from
      // the previous level; integer pixels keep every level exact
      TileOps2.overviewPyramid(
        TileOps.createRaster(s, rasterSpec)(rasterValue),
        rasterSpec.tileSize, levels = 4)
    },
    "raster_resample_avg" -> { (s, _) =>
      TileOps.toPixels(TileOps2.resampleAverage(
        TileOps.createRaster(s, rasterSpec)(rasterValue), 4), rasterSpec.tileSize / 4)
    },
    "raster_resample_bilinear" -> { (s, _) =>
      val spec = rasterSpec.copy(width = 128, height = 128, bands = 1, tileSize = 32)
      TileOps.toPixels(TileOps2.resampleBilinear(
        TileOps.createRaster(s, spec)(rasterValue), 2), spec.tileSize * 2)
    },
    "raster_resample_cubic" -> { (s, _) =>
      val spec = rasterSpec.copy(width = 128, height = 128, bands = 1, tileSize = 32)
      TileOps.toPixels(TileOps2.resampleCubic(
        TileOps.createRaster(s, spec)(rasterValue), 2), spec.tileSize * 2)
    },
    "raster_resample_cubicspline" -> { (s, _) =>
      val spec = rasterSpec.copy(width = 128, height = 128, bands = 1, tileSize = 32)
      TileOps.toPixels(TileOps2.resampleCubicSpline(
        TileOps.createRaster(s, spec)(rasterValue), 2), spec.tileSize * 2)
    },
    "raster_resample_lanczos" -> { (s, _) =>
      val spec = rasterSpec.copy(width = 128, height = 128, bands = 1, tileSize = 32)
      TileOps.toPixels(TileOps2.resampleLanczos(
        TileOps.createRaster(s, spec)(rasterValue), 2), spec.tileSize * 2)
    },
    "raster_resample_mode" -> { (s, _) =>
      TileOps.toPixels(TileOps2.resampleBlock(
        TileOps.createRaster(s, rasterSpec)(rasterValue), 4, "mode"), rasterSpec.tileSize / 4)
    },
    "raster_resample_median" -> { (s, _) =>
      TileOps.toPixels(TileOps2.resampleBlock(
        TileOps.createRaster(s, rasterSpec)(rasterValue), 4, "median"), rasterSpec.tileSize / 4)
    },
    "raster_resample_rms" -> { (s, _) =>
      TileOps.toPixels(TileOps2.resampleBlock(
        TileOps.createRaster(s, rasterSpec)(rasterValue), 4, "rms"), rasterSpec.tileSize / 4)
    },
    "raster_tophat" -> { (s, _) =>
      TileOps.toPixels(TileOps2.tophat(
        TileOps.createRaster(s, convSpec)(rasterValue), 1), convSpec.tileSize)
    },
    "raster_bothat" -> { (s, _) =>
      TileOps.toPixels(TileOps2.bothat(
        TileOps.createRaster(s, convSpec)(rasterValue), 1), convSpec.tileSize)
    },
    "raster_morph_diff" -> { (s, _) =>
      TileOps.toPixels(TileOps2.morphDifference(
        TileOps.createRaster(s, convSpec)(rasterValue), 1), convSpec.tileSize)
    },
    "raster_theilsen" -> { (s, _) =>
      val spec4 = rasterSpec.copy(bands = 4)
      val r = TileOps.createRaster(s, spec4)(
        (x, y, b) => ((x * 5 + y * 3 + b * b * 7) % 53).toDouble)
      TileOps.toPixels(TileOps2.theilSenSlope(r, 4), rasterSpec.tileSize)
    },
    "raster_sobel" -> { (s, _) =>
      val spec = rasterSpec.copy(bands = 1)
      TileOps.toPixels(TileOps2.sobelEdges(
        TileOps.createRaster(s, spec)(rasterValue)), rasterSpec.tileSize)
    },
    "raster_unsharp" -> { (s, _) =>
      TileOps.toPixels(TileOps2.unsharpMask(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, 0.5), convSpec.tileSize)
    },
    "raster_rgb_hsl" -> { (s, _) =>
      val spec3 = rasterSpec.copy(bands = 3)
      val rgb = TileOps.createRaster(s, spec3)(
        (x, y, b) => ((x * 7 + y * 13 + b * 5) % 97).toDouble / 96.0)
      TileOps.toPixels(TileOps2.rgbToHsl(rgb), rasterSpec.tileSize)
    },
    "mm_channel_reorder" -> { (s, dir) =>
      // channel-first→last transpose of a quantized 4×4×4 "image" payload
      // (r3: codegen'd single-pass ChannelTransposeExpr — was a
      // per-element transform+element_at tree, the r2 plan-audit note)
      GraftFunctions.register(s)
      val q = Similarity.quantize(col("embedding"))
      val cl = graft.ops.ArrayOps.channelFirstToLastFast(q, 4, 4, 4)
      embeddingsOf(s, dir).select(col("vec_id"), posexplode(cl).as(Seq("pos", "q")))
    },
    "raster_theilsen_robust" -> { (s, _) =>
      val spec4 = rasterSpec.copy(bands = 4)
      val r = TileOps.createRaster(s, spec4)(
        (x, y, b) => ((x * 5 + y * 3 + b * b * 7) % 53).toDouble)
      TileOps.toPixels(TileOps2.theilSenRobustSlope(r, 4), rasterSpec.tileSize)
    },
    "raster_dem_gradients" -> { (s, _) =>
      val spec = rasterSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)((x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      TileOps.toPixels(TileOps2.hornGradients(dem), rasterSpec.tileSize)
    },
    "raster_warp" -> { (s, _) =>
      // one-call projection + extent + res + nodata warp (warp.py:23-118):
      // 3857 source → 4326 grid, so the inverse mapping is the FORWARD
      // Mercator (radians/tan/ln — bitwise JVM≡DuckDB, the
      // vector_reproject recipe); grid constants are binary-exact
      // (1/64°, -0.125, 51.5) so pixel centers are exact in both engines
      val srcSpec = RasterSpec(0.0, 6800000.0, 1000.0, -1000.0, 128, 128, 64, 1,
        nodata = -9999.0, crs = 3857)
      val src = TileOps.createRaster(s, srcSpec)((x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      val (warped, dstSpec) = TileOps2.warp(src, srcSpec,
        dstCrs = Some(4326),
        dstExtent = Some(BBox(-0.125, 1.25, 51.5, 52.5)),
        dstRes = Some((0.015625, 0.015625)),
        dstNodata = Some(-1.0))
      TileOps.toPixels(warped, dstSpec.tileSize)
    },
    "raster_ndvi" -> { (s, _) =>
      // normalized band difference (b1−b0)/(b1+b0) over the 2-band
      // fixture — integer-valued pixels make the one IEEE division
      // bitwise-portable, no rounding needed
      TileOps.toPixels(TileOps2.normalizedDiff(
        TileOps.createRaster(s, rasterSpec)(rasterValue), bandA = 1, bandB = 0),
        rasterSpec.tileSize)
    },
    "raster_flowdir" -> { (s, _) =>
      // D8 steepest-descent direction codes over the DEM fixture — the
      // drop comparison is exact (integer elevations, one IEEE divide by
      // sqrt(2) both engines round identically), so the argmax code is
      // bitwise-portable with no rounding
      val spec = rasterSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)((x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      TileOps.toPixels(Flow.flowDir(dem), rasterSpec.tileSize)
    },
    "raster_watershed" -> { (s, _) =>
      // flow-sink resolution: every pixel's D8 path followed to its pit
      // by pointer doubling (the redirect-resolver reused over the flow
      // graph — log L rounds, provably acyclic); oracle walks the same
      // paths one hop at a time with a recursive CTE
      val spec = rasterSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)((x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      Flow.flowSinks(TileOps.toPixels(Flow.flowDir(dem), rasterSpec.tileSize),
        width = spec.width, maxHops = 64)
    },
    "raster_costdist" -> { (s, _) =>
      // multi-source obstacle-aware octile distance (cost-distance with
      // unit cost): wall at x=128 with one gap at (128,200), sources on
      // both sides — cross-side wavefronts must route through the gap.
      // Exact-integer (straight, diagonal) state makes the minimum a
      // unique integer pair; FP enters only in the final s + d*sqrt(2)
      // the oracle mirrors as a closed form (direct vs through-gap)
      val spec = rasterSpec.copy(bands = 1)
      val mask = TileOps.createRaster(s, spec)((x, y, _) =>
        if (x == 128 && y != 200) 0.0 else 1.0)
      CostDist.octileDistance(mask, Seq((10, 30), (240, 60)),
        rasterSpec.tileSize, width = spec.width)
    },
    "raster_cost_backlink" -> { (s, _) =>
      // ESRI CostBackLink analog over the same wall-and-gap field: the
      // best-predecessor D8 code per cell, derived by exact integer
      // (s,d) equality from the converged distance state — greedy
      // descent of these codes IS the least-cost path
      val spec = rasterSpec.copy(bands = 1)
      val mask = TileOps.createRaster(s, spec)((x, y, _) =>
        if (x == 128 && y != 200) 0.0 else 1.0)
      CostDist.costBacklink(CostDist.octileDistance(mask,
        Seq((10, 30), (240, 60)), rasterSpec.tileSize, width = spec.width))
    },
    "raster_flowacc" -> { (s, _) =>
      // D8 flow accumulation (upstream-cell count, ESRI convention) via
      // TauDEM-style tile condensation: within-tile Kahn counts map-only
      // after one halo exchange, cross-tile forwarding on the condensed
      // entry graph (perimeter-bounded rounds); oracle re-walks every
      // path one hop at a time and counts landings
      val spec = rasterSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)((x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      Flow.flowAccumulation(Flow.flowDir(dem), rasterSpec.tileSize, width = spec.width)
    },
    "raster_contours" -> { (s, _) =>
      // marching-squares isoline segments at level 20.5 over the DEM
      // fixture — one halo exchange then map-only emission; integer
      // pixels + a .5 level make every interpolated endpoint one
      // correctly-rounded IEEE divide, so the mirror is bitwise
      val spec = rasterSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)((x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      Contours.contourSegments(dem, spec.tileSize, level = 20.5)
    },
    "raster_hillshade" -> { (s, _) =>
      // GDAL-formula hillshade (az 315, alt 45) over the DEM fixture —
      // the ROUND-9 trig recipe of the DEM family (dem.py:242-350)
      val spec = rasterSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)((x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      TileOps.toPixels(TileOps2.demHillshade(dem), rasterSpec.tileSize)
        .select(col("x"), col("y"), col("band"), round(col("v"), 9).as("v"))
    },
    "raster_dem_orientation" -> { (s, _) =>
      // rounded to 9 decimals: same sin/cos 1-ulp mitigation as
      // encode_latlng (aspect branch flips at ulp boundaries are harmless
      // — sin/cos are continuous mod 360, so both sides round alike)
      val spec = rasterSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)((x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      TileOps.toPixels(TileOps2.demOrientation(dem), rasterSpec.tileSize)
        .select(col("x"), col("y"), col("band"), round(col("v"), 9).as("v"))
    },
    "raster_terrain" -> { (s, _) =>
      // gdaldem TRI/TPI/roughness as three output bands over the integer
      // DEM plane — every value an exact dyadic (Σ|Δ|/8, c−Σ/8, max−min)
      val spec = convSpec.copy(bands = 1)
      val dem = TileOps.createRaster(s, spec)(
        (x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      def one(metric: String, code: Int) =
        TileOps.toPixels(TileOps2.demTerrain(dem, metric), convSpec.tileSize)
          .select(col("x"), col("y"), lit(code).as("band"), col("v"))
      one("tri", 0).unionByName(one("tpi", 1)).unionByName(one("roughness", 2))
    },
    "raster_convolve_quantile" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "quantile25"), convSpec.tileSize)
    },
    "raster_convolve_occurrences" -> { (s, _) =>
      // center-value occurrence count (our extension; the reference's
      // occurrences matches func_value — covered by raster_convolve_feather)
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "occurrences_center"), convSpec.tileSize)
    },

    "raster_convolve_mean" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "mean"), convSpec.tileSize)
    },

    "raster_convolve_contrast" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "contrast",
        normalised = false), convSpec.tileSize)
    },

    "raster_convolve_zscore" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "zscore"), convSpec.tileSize)
    },

    "raster_convolve_zscore_mad" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "zscore_mad"), convSpec.tileSize)
    },

    "raster_convolve_roughness" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "roughness"), convSpec.tileSize)
    },

    "raster_convolve_tri" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "tri"), convSpec.tileSize)
    },

    "raster_convolve_tpi" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "tpi"), convSpec.tileSize)
    },

    "raster_convolve_feather" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "feather",
        funcValue = 0.0), convSpec.tileSize)
    },

    "raster_convolve_sigmalee" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "sigma_lee"), convSpec.tileSize)
    },

    "raster_convolve_mad" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "mad"), convSpec.tileSize)
    },

    "raster_shift" -> { (s, _) =>
      val shifted = TileOps2.shift(
        TileOps.createRaster(s, rasterSpec)(rasterValue), 3.0, -2.0)
      shifted.select(col("cellX").as("cell_x"), col("cellY").as("cell_y"),
        col("band"), col("originX").as("origin_x"), col("originY").as("origin_y"))
    },

    "raster_border" -> { (s, _) =>
      val src = rasterSpec.copy(bands = 1)
      val (bordered, ex) = TileOps2.addBorder(
        TileOps.createRaster(s, src)(rasterValue), src, borderPx = 8, value = 7.0)
      TileOps.toPixels(bordered, ex.tileSize)
    },

    // --- salted aggregation (hot-cell skew handling, north rule) ---
    "geo_cell_counts_salted" -> { (s, dir) =>
      GraftFunctions.register(s)
      val p = Pages.pages(s, dir)
      val c12 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(Pages.FineLevel))
      val salted = p.select(
          (GraftFunctions.gridX(c12) * 4096 + GraftFunctions.gridY(c12)).as("cell_key"),
          pmod(col("doc_id"), lit(8)).as("salt"))
        .groupBy("cell_key", "salt").agg(count(lit(1)).as("pn"))
      salted.groupBy("cell_key").agg(sum("pn").as("n_pages"))
    },

    // Salted EXACT count-distinct: unlike plain counts, count(DISTINCT)
    // gets no map-side collapse on a hot key — the standard fix is a
    // two-phase aggregate salted by a hash OF THE DISTINCT KEY (distinct
    // values partition disjointly across salt buckets, so the per-bucket
    // distinct counts sum exactly). Hot cells (10% of pages land in the
    // Paris cell by construction) stay bounded by #salts × #cells.
    "geo_cell_distinct_salted" -> { (s, dir) =>
      GraftFunctions.register(s)
      val p = Pages.pages(s, dir)
      val c12 = GraftFunctions.gridCell(col("lon"), col("lat"), lit(Pages.FineLevel))
      val host = split(col("url"), "/").getItem(2)
      val salted = p.select(
          (GraftFunctions.gridX(c12) * 4096 + GraftFunctions.gridY(c12)).as("cell_key"),
          host.as("host"),
          pmod(xxhash64(host), lit(16)).as("salt"))
        .groupBy("cell_key", "salt").agg(count_distinct(col("host")).as("pd"))
      salted.groupBy("cell_key").agg(sum("pd").as("n_hosts"))
    },

    // --- relational analytics (TPC-H-style) ---
    "tpch_q1" -> { (s, dir) =>
      Relational.pricingSummary(s.read.parquet(s"$dir/lineitem.parquet"))
    },
    "tpch_q3" -> { (s, dir) =>
      Relational.topOrdersByRevenue(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet"))
    },
    "tpch_q6" -> { (s, dir) =>
      Relational.forecastRevenue(s.read.parquet(s"$dir/lineitem.parquet"))
    },
    "tpch_q4" -> { (s, dir) =>
      // Q4-style EXISTS as a LEFT SEMI join (late shipment = shipdate
      // more than 60 days past the order date — this schema has no
      // commit/receipt dates)
      Relational.latePriorityOrders(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"))
    },
    "tpch_q12" -> { (s, dir) =>
      // Q12-style conditional two-way count after an equi-join with a
      // residual lateness predicate (return flag stands in for shipmode)
      Relational.lateByFlag(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"))
    },
    "tpch_q19" -> { (s, dir) =>
      // Q19-style OR-of-conjunctions over both join sides: broadcast the
      // part dim, evaluate the residual disjunction post-join
      Relational.brandRevenue(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/part.parquet"))
    },
    "tpch_q14" -> { (s, dir) =>
      // Q14-style promo revenue share; ppm via decimal cross-multiply +
      // truncating DIV (Long·10⁶ overflows at warehouse scale)
      Relational.promoRevenueShare(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/part.parquet"),
        from = "1996-01-01", until = "1996-03-01")
    },
    "tpch_q13" -> { (s, dir) =>
      // Q13-style order-count distribution: zero-order customers kept by
      // the left join (the outer-join-preserving-zeros shape)
      Relational.orderCountDistribution(
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/orders.parquet"))
    },
    "part_skyline" -> { (s, dir) =>
      // 2-D Pareto skyline (min price, max size) via the bucketed
      // prefix-max — no global window, no dominance theta-join; the
      // NOT-EXISTS oracle certifies the reduction lossless
      Relational.skyline(s.read.parquet(s"$dir/part.parquet"))
    },
    "tpch_q5" -> { (s, dir) =>
      Relational.revenuePerNation(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"),
        s.read.parquet(s"$dir/nation.parquet"),
        s.read.parquet(s"$dir/region.parquet"))
    },
    "tpch_q2" -> { (s, dir) =>
      // correlated-MIN decorrelation: per-part min offer joined back on
      // equality, region-filtered supplier dim broadcast
      Relational.minCostSupplier(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/part.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"),
        s.read.parquet(s"$dir/nation.parquet"),
        s.read.parquet(s"$dir/region.parquet"))
    },
    "tpch_q7" -> { (s, dir) =>
      Relational.volumeShipping(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"),
        s.read.parquet(s"$dir/nation.parquet"))
    },
    "tpch_q8" -> { (s, dir) =>
      // national market share: exact integer numerator/denominator plus
      // truncating DECIMAL(38) ppm — no FP division
      Relational.marketShare(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"),
        s.read.parquet(s"$dir/nation.parquet"),
        s.read.parquet(s"$dir/region.parquet"),
        s.read.parquet(s"$dir/part.parquet"),
        targetNation = "NATION_7", regionName = "ASIA", partType = "ECONOMY")
    },
    "tpch_q9" -> { (s, dir) =>
      Relational.productTypeProfit(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"),
        s.read.parquet(s"$dir/nation.parquet"),
        s.read.parquet(s"$dir/part.parquet"))
    },
    "tpch_q11" -> { (s, dir) =>
      // HAVING-vs-global-scalar decorrelation (1-row broadcast frame,
      // integer cross-multiplied threshold)
      Relational.importantStock(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"),
        s.read.parquet(s"$dir/nation.parquet"),
        nationName = "NATION_3")
    },
    "tpch_q15" -> { (s, dir) =>
      Relational.topSupplier(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"))
    },
    "tpch_q16" -> { (s, dir) =>
      Relational.partSupplierCount(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/part.parquet"))
    },
    "tpch_q17" -> { (s, dir) =>
      // correlated-AVG decorrelation with the 5·qty·n < Σqty integer
      // cross-multiply (no FP average is ever formed)
      Relational.smallQtyRevenue(s.read.parquet(s"$dir/lineitem.parquet"))
    },
    "tpch_q20" -> { (s, dir) =>
      Relational.dominantSuppliers(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/part.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"))
    },
    "tpch_q21" -> { (s, dir) =>
      // the EXISTS / NOT-EXISTS pair as literal semi + anti joins, all
      // keyed on the order key
      Relational.waitingSuppliers(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"))
    },
    "tpch_q22" -> { (s, dir) =>
      Relational.salesOpportunity(
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/orders.parquet"))
    },
    "raster_hypsometric" -> { (s, _) =>
      // elevation-area curve: pixels collapse to per-elevation counts,
      // the running sum rides the tiny value-domain table
      val dem = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      TileOps2.hypsometric(dem, convSpec.tileSize)
    },
    "select_reservoir" -> { (s, dir) =>
      // deterministic per-lang uniform sample: bottom-8 of the md5prefix
      // hash (order-free, mergeable — the reservoir-sampling replacement)
      graft.ops.Selection.hashSample(documentsOf(s, dir), "doc_id",
        Seq("lang"), k = 8, family = "md5prefix")
    },
    "dedup_fuzzy_pairs" -> { (s, dir) =>
      // record linkage by edit distance: 24-char keys, 2-char blocking,
      // levenshtein <= 2 verify, deterministic per-block cap
      Dedup.editDistancePairs(documentsOf(s, dir))
    },
    "ml_stump" -> { (s, dir) =>
      // histogram decision stump (LightGBM/XGBoost 'hist' split-finding)
      // with EXACT cross-multiplied Gini: label = English-vs-rest, two
      // integral text features, 16 bins; only the binned class-count agg
      // touches rows
      val d = documentsOf(s, dir)
        .withColumn("label", when(col("lang") === "en", 1L).otherwise(0L))
        .withColumn("f_chars", col("n_chars"))
        .withColumn("f_digits", (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))).cast("long"))
      graft.ops.Trees.stump(d, "label", Seq("f_chars", "f_digits"), bins = 16)
    },
    "orders_rfm" -> { (s, dir) =>
      // RFM segmentation: recency vs the corpus max date (1-row
      // broadcast), quintiles via deterministic total-ordered ntile
      Relational.rfm(s.read.parquet(s"$dir/orders.parquet"))
    },
    "emb_outliers" -> { (s, dir) =>
      // exact distance-to-centroid ranking via the centered_n identity
      Similarity.centroidOutliers(embeddingsOf(s, dir))
    },
    "emb_center" -> { (s, dir) =>
      // exact mean-centering scaled by n: centered_n = q*n − Σq stays
      // an exact Long per dimension
      Similarity.centerScaled(embeddingsOf(s, dir))
    },
    "basket_pairs" -> { (s, dir) =>
      // a-priori pair pass: per-order brand co-occurrence + exact lift
      Relational.basketPairs(
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/part.parquet"))
    },
    "quality_profile" -> { (s, dir) =>
      // Deequ-style per-column profile: exact counts + truncating
      // completeness ppm, one column-pruned agg per column
      Quality.profile(s.read.parquet(s"$dir/orders.parquet"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
    },
    "quality_summary" -> { (s, dir) =>
      // numeric min/max/sum on the q4 integer grid (order-free sums)
      Quality.numericSummary(s.read.parquet(s"$dir/lineitem.parquet"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    },
    "quality_checks" -> { (s, dir) =>
      // constraint suite with exact integer certificates; includes two
      // deliberately failing checks (o_custkey is not a PK, 'P' status
      // is outside the probed set) so both verdict paths are live
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      Quality.completenessCheck(o, "o_custkey")
        .unionByName(Quality.uniquenessCheck(o, "o_orderkey"))
        .unionByName(Quality.uniquenessCheck(o, "o_custkey"))
        .unionByName(Quality.containmentCheck(o, "o_custkey", c, "c_custkey"))
        .unionByName(Quality.membershipCheck(o, "o_orderstatus", Seq("F", "O")))
        .unionByName(Quality.membershipCheck(o, "o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
        .unionByName(Quality.rangeCheck(o, "o_totalprice", 0L, 5000000000L))
    },

    // --- vector layer (WKT geometry, attribute ops, vector-vector join) ---
    "vector_wkt_info" -> { (s, _) =>
      graft.ops.VectorOps.withGeomInfo(vectorFeatures(s), "wkt")
        .select("fid", "klass", "area", "x_min", "x_max", "y_min", "y_max")
    },
    "vector_extract_attr" -> { (s, _) =>
      graft.ops.VectorOps.extractByAttribute(vectorFeatures(s), "klass", Seq("c1", "c3"))
        .select("fid", "klass")
    },
    "vector_dissolve" -> { (s, _) =>
      graft.ops.VectorOps.dissolveByAttribute(vectorFeatures(s), "klass", "wkt")
    },
    "vector_dissolve_union" -> { (s, _) =>
      // overlapping rects (w=4 on a 3-step lattice) so the union is a real
      // geometric merge, not a sum of areas
      val f = s.range(60).select(
        col("id"),
        concat(lit("u"), (col("id") % 3).cast("string")).as("klass"),
        ((col("id") % 10) * 3).cast("int").as("x0"),
        ((col("id") / 10).cast("long") * 2).cast("int").as("y0"),
        lit(4).as("w"), lit(3).as("h"))
        .withColumn("wkt", rectWkt(col("x0"), col("y0"), col("w"), col("h")))
      graft.ops.VectorOps.dissolveUnion(f, "klass", "wkt")
        .select("klass", "n_features", "union_area", "x_min", "x_max", "y_min", "y_max")
    },
    "vector_dissolve_union_general" -> { (s, _) =>
      // chains of 45°-rotated squares (L1 balls r=3 spaced 4): a real
      // non-rectilinear union per class with closed-form area
      // k·2r² − (k−1)·(2r−d)²/2 and an exactly countable ring shape
      val f = s.range(60).select(
        col("id"),
        concat(lit("u"), (col("id") % 3).cast("string")).as("klass"),
        (expr("id DIV 3") * 4).cast("int").as("cx"))
        .withColumn("wkt", format_string("POLYGON((%d 0,%d -3,%d 0,%d 3,%d 0))",
          col("cx") - 3, col("cx"), col("cx") + 3, col("cx"), col("cx") - 3))
      graft.ops.VectorOps.dissolveUnion(f, "klass", "wkt")
        .select("klass", "n_features", "union_area", "n_rings", "n_vertices",
          "x_min", "x_max", "y_min", "y_max")
    },
    "vector_join_intersect" -> { (s, _) =>
      graft.ops.VectorOps.intersectJoin(vectorFeatures(s), vectorQueries(s), "wkt", "fid", "qid")
        .groupBy(col("match_fid").as("qid"))
        .agg(count(lit(1)).as("n_feats"), min("fid").as("min_fid"), max("fid").as("max_fid"))
    },
    "vector_multipart" -> { (s, _) =>
      graft.ops.VectorOps.multipartToSingle(vectorMulti(s), "wkt", "fid")
        .groupBy("fid").agg(count(lit(1)).as("n_parts"))
    },
    "vector_extent" -> { (s, _) =>
      graft.ops.VectorOps.toExtent(vectorFeatures(s), "wkt")
    },
    "vector_reset_fids" -> { (s, _) =>
      // reset on a filtered layer so the renumbering is non-trivial
      val sub = graft.ops.VectorOps.extractByAttribute(
        vectorFeatures(s), "klass", Seq("c2", "c4"))
      graft.ops.VectorOps.resetFids(sub.withColumnRenamed("fid", "old_fid"), "old_fid")
        .select("old_fid", "fid", "fid_attr", "klass")
    },
    "vector_convert_multitype" -> { (s, _) =>
      graft.ops.VectorOps.convertGeometryMultitype(vectorFeatures(s), "wkt",
        multitype = true)
        .select(col("fid"), col("geom_type"), col("conv_wkt"))
    },
    "raster_cast" -> { (s, _) =>
      // float plane with fractional .25/.75 values (tie-free in every
      // engine's rounding), negatives and >255 so both clamps fire
      val tiles = TileOps.createRaster(s, rasterSpec)(
        (x, y, b) => rasterValue(x, y, b) * 3.5 - 39.75)
      TileOps.toPixels(TileOps2.castDtype(tiles, "uint8"), rasterSpec.tileSize)
    },
    "vector_fix_geometry" -> { (s, _) =>
      // defect cycle: 0 valid CCW, 1 reversed (CW), 2 duplicated vertex,
      // 3 unclosed ring — repair must normalize all to a 4-pt CCW ring
      val f = s.range(120).select(
        col("id").as("fid"),
        ((col("id") % 15) * 5).cast("int").as("x0"),
        ((col("id") / 15).cast("long") * 6).cast("int").as("y0"),
        (col("id") % 3 + 2).cast("int").as("w"),
        (col("id") % 4 + 1).cast("int").as("h"))
      val xs = col("x0").cast("string"); val ys = col("y0").cast("string")
      val x1 = (col("x0") + col("w")).cast("string")
      val y1 = (col("y0") + col("h")).cast("string")
      def pt(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        concat(a, lit(" "), b)
      val defect = f.withColumn("wkt",
        when(col("fid") % 4 === 0, rectWkt(col("x0"), col("y0"), col("w"), col("h")))
          .when(col("fid") % 4 === 1, concat(lit("POLYGON(("),
            pt(xs, ys), lit(", "), pt(xs, y1), lit(", "), pt(x1, y1), lit(", "),
            pt(x1, ys), lit(", "), pt(xs, ys), lit("))")))
          .when(col("fid") % 4 === 2, concat(lit("POLYGON(("),
            pt(xs, ys), lit(", "), pt(x1, ys), lit(", "), pt(x1, ys), lit(", "),
            pt(x1, y1), lit(", "), pt(xs, y1), lit(", "), pt(xs, ys), lit("))")))
          .otherwise(concat(lit("POLYGON(("),
            pt(xs, ys), lit(", "), pt(x1, ys), lit(", "), pt(x1, y1), lit(", "),
            pt(xs, y1), lit("))"))))
      graft.ops.VectorOps.fixGeometry(defect, "fid", "wkt")
        .select("fid", "was_valid", "n_rings", "n_pts", "area")
    },
    "vector_join_concave" -> { (s, _) =>
      // concave L-shaped features vs rect probes: exercises the general
      // (non-convex) intersect refine — a probe inside the L's notch
      // overlaps the bbox but NOT the polygon
      val f = s.range(80).select(
        col("id").as("fid"),
        ((col("id") % 10) * 6).cast("int").as("x0"),
        ((col("id") / 10).cast("long") * 8).cast("int").as("y0"))
      def c(e: org.apache.spark.sql.Column) = e.cast("string")
      val lWkt = concat(lit("POLYGON(("),
        c(col("x0")), lit(" "), c(col("y0")), lit(", "),
        c(col("x0") + 4), lit(" "), c(col("y0")), lit(", "),
        c(col("x0") + 4), lit(" "), c(col("y0") + 2), lit(", "),
        c(col("x0") + 2), lit(" "), c(col("y0") + 2), lit(", "),
        c(col("x0") + 2), lit(" "), c(col("y0") + 6), lit(", "),
        c(col("x0")), lit(" "), c(col("y0") + 6), lit(", "),
        c(col("x0")), lit(" "), c(col("y0")), lit("))"))
      val feats = f.withColumn("wkt", lWkt)
      graft.ops.VectorOps.intersectJoin(feats, vectorQueries(s), "wkt", "fid", "qid")
        .groupBy(col("match_fid").as("qid"))
        .agg(count(lit(1)).as("n_feats"), min("fid").as("min_fid"), max("fid").as("max_fid"))
    },

    // --- clip / erase / buffer / layer reprojection (round 3; reference
    //     buteo/vector/clip.py, buffer.py, reproject.py) ---
    "vector_clip" -> { (s, _) =>
      graft.ops.VectorOps2.clip(vectorFeatures(s), clipZones, "wkt", "fid")
        .select("fid", "clip_id", "clip_area", "n_rings", "n_pts",
          "x_min", "x_max", "y_min", "y_max")
    },
    "vector_erase" -> { (s, _) =>
      val clips = Seq((1L, Polygon.box(BBox(10.0, 40.0, 0.0, 30.0))))
      graft.ops.VectorOps2.erase(vectorFeatures(s), clips, "wkt", "fid")
        .select("fid", "erase_area")
    },
    "vector_buffer" -> { (s, _) =>
      graft.ops.VectorOps2.buffer(vectorFeatures(s), "wkt", "fid",
        col("fid") % 3 + 1, joinStyle = "square")
        .select("fid", "dist", "buf_area", "n_rings", "n_pts",
          "x_min", "x_max", "y_min", "y_max")
    },
    "vector_buffer_round" -> { (s, _) =>
      // round joins, q=2 → 8-gon Minkowski disc; closed-form area mirrored
      // at 1e-6 (sin/sqrt are bitwise-identical Java vs DuckDB; the 1e-12
      // shoelace-vs-closed-form difference vanishes under ROUND)
      graft.ops.VectorOps2.buffer(vectorFeatures(s), "wkt", "fid",
        lit(2.0), joinStyle = "round", quadSegs = 2)
        .select(col("fid"), round(col("buf_area"), 6).as("buf_area_r"),
          col("n_rings"))
    },
    "vector_reproject" -> { (s, _) =>
      graft.ops.VectorOps2.reprojectLayer(vectorFeatures(s), "wkt", "fid", 4326, 3857)
        .select("fid", "n_rings", "n_pts", "x_min", "x_max", "y_min", "y_max")
    },
    "vector_split_attr" -> { (s, _) =>
      // vector_split_by_attribute (core_vector_split.py): partitioned
      // write, one directory per attribute value — then read BACK from
      // the partitioned layout and aggregate, so the oracle checks that
      // the split+manifest round-trip preserves every row
      val dir = java.nio.file.Files.createTempDirectory("vsplit").toString
      graft.ops.VectorOps.splitByAttribute(vectorFeatures(s).drop("wkt"), "klass", dir)
      s.read.parquet(dir)
        .groupBy("klass")
        .agg(count(lit(1)).as("n"), sum("fid").as("fid_sum"), sum("x0").as("x0_sum"))
    },
    "vector_attr_edit" -> { (s, _) =>
      // attribute-table family in one pipeline: add_field (null double),
      // set_attribute_table (update klass for fid<10 + create `note` as
      // string, matched on fid), delete_fields (drop w/h)
      val feats = vectorFeatures(s)
      val added = graft.ops.VectorOps.addField(feats, "score", "double")
      val rows = (0 until 10).map(i => Seq[Any](i, s"u${i % 3}", "edited"))
      val set = graft.ops.VectorOps.setAttributeTable(added,
        Seq("fid", "klass", "note"), rows)
      graft.ops.VectorOps.deleteFields(set, Seq("w", "h"))
        .select("fid", "klass", "x0", "y0", "score", "note")
    },
    "vector_hexgrid" -> { (s, _) =>
      // flat-top hex fishnet (reference grid.py:24 is an unimplemented
      // stub — realized here); pure column expressions from spark.range
      graft.ops.VectorOps2.hexGrid(s, 0.0, 30.0, 0.0, 20.0, 2.0)
    },
    "vector_shapes" -> { (s, _) =>
      // shape characteristics over the non-convex L-shape fixture; the
      // engine runs general WKT shoelace + monotone-chain hull, the
      // oracle derives every metric in closed form from the lattice
      // params. ROUND 9 on the sqrt-bearing metrics (hull diagonal is
      // summed in ring order here, closed form there — ulp mitigation)
      graft.ops.VectorOps.addShapes(vectorLShapes(s), "fid", "wkt")
        .select(col("fid"), col("area"), col("perimeter"),
          round(col("ipq"), 9).as("ipq_r"),
          col("hull_area"),
          round(col("hull_peri"), 9).as("hull_peri_r"),
          col("hull_ratio"),
          round(col("compactness"), 9).as("compactness_r"),
          col("centroid_x"), col("centroid_y"))
    },

    // --- extract_by_location full predicate family (r3; reference
    //     buteo/vector/extract_by_location.py:142-164) ---
    "vector_loc_contains" -> { (s, _) =>
      graft.ops.VectorOps2.extractByLocation(vectorFeatures(s),
        Seq(Polygon.box(BBox(4.25, 4.5, 0.25, 0.5)),
          Polygon.box(BBox(16.5, 17.0, 10.25, 10.75))),
        "wkt", "fid", "contains")
    },
    "vector_loc_within" -> { (s, _) =>
      graft.ops.VectorOps2.extractByLocation(vectorFeatures(s),
        Seq(Polygon.box(BBox(0.0, 30.0, 0.0, 20.0))), "wkt", "fid", "within")
    },
    "vector_loc_within_anti" -> { (s, _) =>
      graft.ops.VectorOps2.extractByLocation(vectorFeatures(s),
        Seq(Polygon.box(BBox(0.0, 30.0, 0.0, 20.0))), "wkt", "fid", "within",
        invert = true)
    },
    "vector_loc_touches" -> { (s, _) =>
      graft.ops.VectorOps2.extractByLocation(vectorFeatures(s),
        Seq(Polygon.box(BBox(0.0, 80.0, -2.0, 0.0))), "wkt", "fid", "touches")
    },
    "vector_loc_overlaps" -> { (s, _) =>
      graft.ops.VectorOps2.extractByLocation(vectorFeatures(s),
        Seq(Polygon.box(BBox(2.0, 50.0, 2.0, 3.0))), "wkt", "fid", "overlaps")
    },
    "select_stratified" -> { (s, dir) =>
      graft.ops.Selection.samplingStratified(
        documentsOf(s, dir).select("doc_id", "lang"), "doc_id", "lang")
    },
    "select_split" -> { (s, dir) =>
      graft.ops.Selection.splitTrainValTest(
        documentsOf(s, dir).select("doc_id"), "doc_id", valSize = 0.1, testSize = 0.1)
    },

    // --- AI augmentation + masking (round 3; reference buteo/ai) ---
    "aug_rot90" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.rot90(
        TileOps.createRaster(s, convSpec)(rasterValue), convSpec, 1), convSpec.tileSize)
    },
    "aug_mirror" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.mirror(
        TileOps.createRaster(s, convSpec)(rasterValue), convSpec, 3), convSpec.tileSize)
    },
    "aug_rot_patch" -> { (s, _) =>
      // per-patch seeded rotation: k ∈ {1,2,3} drawn per tile
      TileOps.toPixels(graft.tiles.Augment.rotationPatch(
        TileOps.createRaster(s, convSpec)(rasterValue), seed = 7), convSpec.tileSize)
    },
    "aug_mirror_patch" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.mirrorPatch(
        TileOps.createRaster(s, convSpec)(rasterValue), seed = 11), convSpec.tileSize)
    },
    "aug_noise_uniform" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.noiseUniform(
        TileOps.createRaster(s, convSpec)(rasterValue), convSpec.tileSize,
        maxAmount = 0.5, additive = true, perChannel = true, seed = 42),
        convSpec.tileSize)
    },
    "aug_channel_scale" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.channelScale(
        TileOps.createRaster(s, convSpec)(rasterValue),
        maxAmount = 0.5, additive = true, seed = 3), convSpec.tileSize)
    },
    "aug_label_smooth" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.labelSmoothFlat(
        TileOps.createRaster(s, convSpec)(rasterValue),
        maxAmount = 0.1, fixedAmount = true, seed = 1), convSpec.tileSize)
    },
    "aug_mixup" -> { (s, _) =>
      val t = TileOps.createRaster(s, convSpec)(rasterValue)
      val src = TileOps.createRaster(s, convSpec)(mixValue)
      TileOps.toPixels(graft.tiles.Augment.mixup(t, src, 0.333, 0.666, seed = 21),
        convSpec.tileSize)
    },
    "aug_cutmix" -> { (s, _) =>
      val t = TileOps.createRaster(s, convSpec)(rasterValue)
      val src = TileOps.createRaster(s, convSpec)(mixValue)
      TileOps.toPixels(graft.tiles.Augment.cutmix(t, src, 0.333, 0.666, seed = 33),
        convSpec.tileSize)
    },
    "aug_mask_pixels" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.maskPixels2d(
        TileOps.createRaster(s, convSpec)(rasterValue), convSpec.tileSize,
        p = 0.05, seed = 7), convSpec.tileSize)
    },
    "aug_contrast" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.contrast(
        TileOps.createRaster(s, convSpec)(rasterValue),
        maxAmount = 0.3, seed = 9), convSpec.tileSize)
    },
    "aug_encode_position" -> { (s, _) =>
      // positional-encoding plane; sin/cos rounded to 9 (1-ulp Java vs
      // DuckDB divergence, same mitigation as encode_latlng)
      val enc = graft.tiles.Augment.encodeArrPosition(
        TileOps.createRaster(s, convSpec)(rasterValue), convSpec)
      TileOps.toPixels(enc, convSpec.tileSize)
        .select(col("x"), col("y"), col("band"), round(col("v"), 9).as("v_r"))
    },
    "aug_mask_rect" -> { (s, _) =>
      TileOps.toPixels(graft.tiles.Augment.maskRectangle(
        TileOps.createRaster(s, convSpec)(rasterValue), p = 1.0, seed = 17),
        convSpec.tileSize)
    },

    // --- more convolution methods / rasterize / band ops ---
    "raster_convolve_variance" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "variance"), convSpec.tileSize)
    },
    "raster_convolve_mode" -> { (s, _) =>
      TileOps.toPixels(TileOps.convolve(
        TileOps.createRaster(s, convSpec)(rasterValue), 1, "mode"), convSpec.tileSize)
    },
    "raster_rasterize" -> { (s, _) =>
      TileOps.toPixels(TileOps2.rasterize(s, rasterSpec.copy(bands = 1), zonePolys),
        rasterSpec.tileSize).filter(col("v") =!= lit(rasterSpec.nodata))
    },
    "raster_band_select" -> { (s, _) =>
      TileOps.tileStats(TileOps.createRaster(s, rasterSpec)(rasterValue)
        .filter((t: graft.tiles.Tile) => t.band == 1))
    },

    "raster_distance" -> { (s, _) =>
      // Chebyshev distance (bound 3) to pixels with value 0
      val r = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      TileOps.toPixels(graft.tiles.TileOps3.distanceTransform(r, 0.0, 3), convSpec.tileSize)
    },
    "raster_distance_euclid" -> { (s, _) =>
      // the reference's exact convolve_distance semantics: Euclidean,
      // sorted-candidate early exit, maxDist fill
      val r = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      TileOps.toPixels(graft.tiles.TileOps3.distanceTransformEuclid(r, 0.0, 3.0),
        convSpec.tileSize)
    },

    "raster_sieve" -> { (s, _) =>
      // gdal_sieve: planted islands (two of them tile-boundary-spanning)
      // below 16 px dissolve into the background region; E (72 px) and
      // F (18 px) survive — the oracle is the closed-form survivor CASE
      val spec = RasterSpec(0.0, 24.0, 0.25, -0.25, 96, 96, 32, 1)
      def isl(x: Int, y: Int): Double =
        if (x >= 30 && x <= 34 && y >= 5 && y <= 7) 10.0        // A 15 px
        else if (x >= 60 && x <= 62 && y >= 30 && y <= 34) 11.0 // B 15
        else if (x >= 10 && x <= 11 && y >= 40 && y <= 41) 12.0 // C 4
        else if (x == 50 && y == 50) 13.0                       // D 1
        else if (x >= 70 && x <= 78 && y >= 60 && y <= 67) 14.0 // E 72
        else if (x <= 2 && y >= 90) 15.0                        // F 18
        else 0.0
      graft.tiles.Vectorize.sieve(
        TileOps.createRaster(s, spec)((x, y, _) => isl(x, y)), spec,
        minPixels = 16)
    },
    "raster_hist_match" -> { (s, _) =>
      // relative radiometric normalization: source 97-value plane mapped
      // through the reference 61-value CDF, nearest-rank, all-Long exact
      val spec = convSpec.copy(bands = 1)
      val src = TileOps.createRaster(s, spec)(
        (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      val ref = TileOps.createRaster(s, spec)(
        (x, y, _) => ((x * 5 + y * 11) % 61).toDouble)
      TileOps.toPixels(graft.tiles.TileOps3.histogramMatch(src, ref),
        spec.tileSize)
    },
    "raster_curvature" -> { (s, _) =>
      // Zevenbergen–Thorne curvature triple: general form fully exact
      // (dyadic quadric coefficients), directional forms share ONE
      // mirrored IEEE division
      val r = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      TileOps2.curvature(r, convSpec.tileSize)
    },
    "raster_transect" -> { (s, _) =>
      // elevation profile along the (3,7)->(91,55) DDA line — map-only,
      // each tile emits only the steps landing inside it
      val dem = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      graft.tiles.TileOps3.transect(dem, convSpec.tileSize, 3, 7, 91, 55)
    },
    "raster_zone_geom" -> { (s, _) =>
      // per-label area / 4-connected perimeter / bbox / isoperimetric
      // compactness over a 12x12-blocked label plane; pixels fold into
      // per-tile per-label partials, so only |labels| rows shuffle
      val labels = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => (((x / 12) * 31 + (y / 12) * 17) % 5).toDouble)
      TileOps2.labelGeometry(labels, convSpec.tileSize)
    },
    "raster_viewshed" -> { (s, _) =>
      // bounded-radius line-of-sight from (48,48)+10 over the integer
      // terrain plane; DDA ray + integer cross-multiplied slope compare
      // make every visibility bit exact
      val dem = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => ((x * 3 + y * 5) % 41).toDouble)
      TileOps.toPixels(graft.tiles.TileOps3.viewshed(
        dem, convSpec.tileSize, ox = 48, oy = 48, obsHeight = 10.0,
        maxDist = 20), convSpec.tileSize)
    },
    "raster_allocation" -> { (s, _) =>
      // Euclidean allocation: sparse sources carry unique ids (x*256+y+1);
      // every pixel takes its nearest source's id under the pinned
      // (d², dy, dx) tie order, radius 12
      val r = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => if ((x * 31 + y * 17) % 193 == 0) (x * 256 + y + 1).toDouble else 0.0)
      TileOps.toPixels(graft.tiles.TileOps3.allocation(r, maxDist = 12),
        convSpec.tileSize)
    },

    "raster_fill" -> { (s, _) =>
      // nodata holes where v%97==0, one inverse-distance fill pass
      val r = TileOps.createRaster(s, convSpec.copy(bands = 1))(
        (x, y, _) => { val v = (x * 7 + y * 13) % 97; if (v == 0) -9999.0 else v.toDouble })
      TileOps.toPixels(graft.tiles.TileOps3.fillNearest(r, 1), convSpec.tileSize)
    },

    // --- vectorize (raster → constant-value regions; buteo vectorize.py) ---
    "raster_vectorize" -> { (s, _) =>
      // diagonal stripes: v = (x+y)/64 → 8 non-rectangular 4-connected
      // regions, each spanning many tiles (exercises the cross-tile merge)
      val spec = rasterSpec.copy(bands = 1)
      val r = TileOps.createRaster(s, spec)((x, y, _) => ((x + y) / 64).toDouble)
      graft.tiles.Vectorize.vectorize(r, spec)
    },

    "raster_vectorize_rings" -> { (s, _) =>
      // 10×10 value blocks (26×26 grid, clipped at the right/bottom edge)
      // offset against the 32-pixel tiling → every block is one region
      // whose ring must be assembled across tiles
      val spec = rasterSpec.copy(bands = 1)
      val r = TileOps.createRaster(s, spec)((x, y, _) => ((x / 10 + y / 10) % 3).toDouble)
      graft.tiles.Vectorize.vectorizeRings(r, spec)
    },

    "raster_zonal_binned_mode" -> { (s, _) =>
      // continuous plane (fractional noise term): GDAL-style 256-bin
      // approx-histogram mode per zone (r3 — fills the documented
      // continuous-mode gap of zonalStatsApprox)
      val r = TileOps.createRaster(s, rasterSpec.copy(bands = 1))(
        (x, y, _) => rasterValue(x, y, 0) + ((x * 31 + y * 17) % 101) / 101.0)
      graft.tiles.Zonal.zonalBinnedMode(r, zonePolys)
    },

    "raster_vectorize_rings_geo" -> { (s, _) =>
      // same regions, rings emitted in GEO coordinates via the raster
      // geotransform (origin (0,64), quarter-degree pixels) — the
      // polygonize output a GIS consumer actually loads
      val spec = rasterSpec.copy(bands = 1)
      val r = TileOps.createRaster(s, spec)((x, y, _) => ((x / 10 + y / 10) % 3).toDouble)
      graft.tiles.Vectorize.vectorizeRings(r, spec, geoCoords = true)
    },

    // --- scalers / ML prep ---
    "scaler_minmax" -> { (s, dir) =>
      graft.ops.Scalers.minMax(documentsOf(s, dir).select("doc_id", "n_chars"),
        "n_chars", "scaled").select("doc_id", "scaled")
    },
    "scaler_standardize" -> { (s, dir) =>
      graft.ops.Scalers.standardize(documentsOf(s, dir).select("doc_id", "n_chars"),
        "n_chars", "z").select("doc_id", "z")
    },
    "scaler_mad" -> { (s, dir) =>
      graft.ops.Scalers.standardizeMad(documentsOf(s, dir).select("doc_id", "n_chars"),
        "n_chars", "z_mad").select("doc_id", "z_mad")
    },
    "scaler_iqr" -> { (s, dir) =>
      graft.ops.Scalers.scaleIqr(documentsOf(s, dir).select("doc_id", "n_chars"),
        "n_chars", "z_iqr").select("doc_id", "z_iqr")
    },
    "scaler_range" -> { (s, dir) =>
      graft.ops.Scalers.scaleToRange(documentsOf(s, dir).select("doc_id", "n_chars"),
        "n_chars", 2.0, 7.0, "scaled").select("doc_id", "scaled")
    },
    "encode_latlng" -> { (s, dir) =>
      // rounded to 9 decimals: Java and DuckDB sin/cos differ by 1 ulp on
      // ~0.2% of inputs, which ROUND(·, 9) absorbs (r3: was rows-only)
      graft.ops.Scalers.encodeLatLng(Pages.pages(s, dir), "lat", "lon")
        .select(col("doc_id"), round(col("lat_sin"), 9).as("lat_sin_r"),
          round(col("lat_cos"), 9).as("lat_cos_r"),
          round(col("lng_sin"), 9).as("lng_sin_r"),
          round(col("lng_cos"), 9).as("lng_cos_r"))
    },
    "mm_image_decode" -> { (s, _) =>
      // REAL PNG decode: 100 deterministic 48×32 RGB images, each
      // encoded with filter type id%5 (all five unfilter paths on the
      // production path); oracle recomputes channel sums from the pixel
      // formula without touching PNG
      import s.implicits._
      val docs = s.range(100).map { id =>
        val w = 48; val h = 32
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = (y * w + x) * 3
            px(o) = (((x * 7 + y * 3 + id) % 256) & 0xff).toByte
            px(o + 1) = (((x * 5 + y * 11 + 2 * id) % 256) & 0xff).toByte
            px(o + 2) = (((x * 13 + y + 3 * id) % 256) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        (id, graft.ops.Codecs.encodePng(w, h, 3, px, filterType = (id % 5).toInt))
      }.toDF("doc_id", "png")
      graft.ops.Multimodal.imageFeatures(docs, "doc_id", "png")
    },
    "mm_tiff_decode" -> { (s, _) =>
      // REAL GeoTIFF decode (header + IFD walk + strips + geo tags; both
      // byte orders and ImageIO cross-validated in TiffSpec): encode 100
      // deterministic georeferenced gray rasters, decode, and report
      // pixel sums AND the recovered geotransform — the oracle computes
      // both from the closed form without touching TIFF bytes
      import s.implicits._
      s.range(100).map { id =>
        val w = 32; val h = 24
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = ((x * 5 + y * 11 + id) % 256).toByte
            x += 1
          }
          y += 1
        }
        val bytes = graft.ops.Tiff.encode(w, h, 1, px,
          originX = id.toDouble, originY = 100.0 + id, pxW = 0.25, pxH = -0.25)
        val d = graft.ops.Tiff.decode(bytes)
        var sum = 0L
        d.pixels.foreach(b => sum += (b & 0xff))
        (id, d.width, d.height, d.channels, sum,
          d.originX, d.originY, d.pxW, d.pxH)
      }.toDF("doc_id", "width", "height", "channels", "px_sum",
        "origin_x", "origin_y", "px_w", "px_h")
    },
    "raster_tiff_roundtrip" -> { (s, _) =>
      // the buteo lifecycle end-to-end on REAL bytes: every tile of the
      // plane serializes to a georeferenced GeoTIFF (its own per-tile
      // geotransform), deserializes, and must reproduce pixels AND grid
      // placement exactly — the oracle is the plain closed form, so a
      // hash match proves the container round trip lossless
      val spec = convSpec.copy(bands = 1)
      val tiles = TileOps.createRaster(s, spec)(
        (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
      import s.implicits._
      val back = tiles.map { t =>
        val px = new Array[Byte](t.w * t.h)
        var i = 0
        while (i < px.length) { px(i) = t.pixels(i).toInt.toByte; i += 1 }
        val bytes = graft.ops.Tiff.encode(t.w, t.h, 1, px,
          t.originX, t.originY, t.pxW, t.pxH)
        val d = graft.ops.Tiff.decode(bytes)
        t.copy(w = d.width, h = d.height,
          originX = d.originX, originY = d.originY, pxW = d.pxW, pxH = d.pxH,
          pixels = d.pixels.map(b => (b & 0xff).toDouble))
      }(TileOps.tileEnc)
      TileOps.toPixels(back, convSpec.tileSize)
    },
    "mm_gif_decode" -> { (s, _) =>
      // REAL GIF decode (LZW, cross-validated against ImageIO both
      // directions in GifSpec): 100 deterministic paletted 40x30 frames;
      // oracle recomputes channel sums from the palette formula without
      // touching GIF
      import s.implicits._
      val docs = s.range(100).map { id =>
        val w = 40; val h = 30; val n = 64
        val pal = new Array[Byte](3 * n)
        var i = 0
        while (i < n) {
          pal(3 * i) = ((i * 37 + 11) % 256).toByte
          pal(3 * i + 1) = ((i * 73 + 5) % 256).toByte
          pal(3 * i + 2) = ((i * 151 + 99) % 256).toByte
          i += 1
        }
        val idx = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            idx(y * w + x) = (((x * 3 + y * 7 + id) % n) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        (id, graft.ops.Codecs.encodeGif(w, h, pal, idx))
      }.toDF("doc_id", "gif")
      graft.ops.Multimodal.imageFeatures(docs, "doc_id", "gif")
    },
    "mm_phash_pairs" -> { (s, _) =>
      // image near-dup dedup: 12 pattern families × 5 sparse-noise
      // variants → DCT pHash → 4×16-bit pigeonhole hamming join (banding
      // is lossless at ≤3 bits; the hot-bucket cap never binds on this
      // fixture, so the pair set is exhaustive).
      // Hash-exact pinned-constant oracle (VERDICT r4 #5 — the fixture is
      // deterministic, so the pair set is a constant table); ImageHashSpec
      // additionally proves the join ≡ brute-force popcount over all
      // pairs plus the hash's brightness/contrast invariances.
      val hashes = graft.ops.ImageHash.phashTable(
        phashImageFixture(s), "doc_id", "png")
      graft.ops.ImageHash.hammingPairs(hashes, "doc_id", maxDist = 3)
        .orderBy("doc_a", "doc_b")
    },
    "mm_phash_clusters" -> { (s, _) =>
      // scale form of mm_phash_pairs: identical hashes contract to star
      // edges (the 20 planted byte-identical copies of image 0 never
      // enter the band join), distinct hashes band-join capped per
      // bucket, connected components merge the closure. capPerBucket = 4
      // on purpose: exactness for identical-hash groups must not depend
      // on the cap. Pinned-constant oracle over the deterministic fixture.
      import s.implicits._
      val base = phashImageFixture(s)
      val copies = base.filter(col("doc_id") === 0).as[(Long, Array[Byte])]
        .flatMap { case (_, png) => (100L until 120L).map(i => (i, png)) }
        .toDF("doc_id", "png")
      val hashes = graft.ops.ImageHash.phashTable(
        base.unionByName(copies), "doc_id", "png")
      graft.ops.ImageHash.phashClusters(hashes, "doc_id", maxDist = 3,
          capPerBucket = 4)
        .orderBy("doc_id")
    },
    "mm_ahash_pairs" -> { (s, _) =>
      // audio near-dup dedup: 8 harmonic-stack families × 3 dither
      // variants → floored log-spectrogram spectral hash → the same
      // pigeonhole hamming join as images (cap never binds here).
      // Hash-exact pinned-constant oracle; AudioHashSpec carries the
      // brute-force differential and the exact gain-invariance proof.
      import s.implicits._
      val docs = s.range(24).map { id =>
        val fam = (id / 3).toInt; val variant = (id % 3).toInt
        val n = 8192
        val samples = Array.tabulate(n) { i =>
          val t = i / 8000.0
          val f0 = 200.0 + fam * 97.0
          val tones = (1 to 6).map(k => math.sin(2 * math.Pi * f0 * k * t) / k).sum * 4000.0
          val bed = ((i * 2654435761L >>> 9) % 2001 - 1000) * 0.4
          val dither = if (variant == 0) 0L else (i * 40503L * variant >>> 3) % 41 - 20
          (tones + bed + dither).toInt.max(Short.MinValue).min(Short.MaxValue).toShort
        }
        (id, graft.ops.Codecs.encodeWavPcm16(samples, 8000))
      }.toDF("doc_id", "wav")
      val hashes = graft.ops.AudioHash.ahashTable(docs, "doc_id", "wav")
      graft.ops.AudioHash.hammingPairs(hashes, "doc_id", maxDist = 3)
        .orderBy("doc_a", "doc_b")
    },
    "mm_vhash_pairs" -> { (s, _) =>
      // video near-dup dedup: per-sampled-frame pHash + temporally
      // ALIGNED pigeonhole join (pairs must agree at >=2 frame
      // positions — a single shared still is not a duplicate clip).
      // Hash-exact pinned-constant oracle; VideoHashSpec carries the
      // brute-force differential and the shared-still separation case.
      import s.implicits._
      val w = 48; val h = 32
      val docs = s.range(30).map { id =>
        val fam = (id / 3).toInt; val variant = (id % 3).toInt
        val frames = (0 until 9).map { fi =>
          Array.tabulate[Byte](w * h) { j =>
            val x = j % w; val y = j / w
            val v = (128 + 100 * math.sin((x + fi * 3) * (fam + 1) * 0.2) *
              math.cos(y * (fam + 2) * 0.15)).toInt.max(0).min(255)
            val d = if (variant > 0 && j % 197 < variant) 5 else 0
            ((v + d).min(255) & 0xff).toByte
          }
        }
        (id, graft.ops.Codecs.encodeAvi(w, h, 33333, frames))
      }.toDF("doc_id", "avi")
      val fh = graft.ops.VideoHash.frameHashTable(docs, "doc_id", "avi", stride = 3)
      graft.ops.VideoHash.nearDupPairs(fh, "doc_id", maxDist = 3, minMatchFrames = 2)
        .orderBy("doc_a", "doc_b")
    },
    "mm_jpeg_decode" -> { (s, _) =>
      // REAL baseline-JPEG decode (graft.ops.Jpeg — from-scratch huffman
      // + IDCT): 50 deterministic gradients encoded with the JDK ImageIO
      // writer, decoded on the production imageFeatures path. Pinned-
      // constant oracle (no closed form for a lossy codec's channel sums);
      // NOTE the pin bakes in THIS container's ImageIO encoder output —
      // a different JDK vendor/major could emit different JPEG bytes and
      // would need a re-pin (tools/pin_oracle.py). JpegSpec additionally
      // pins the decoder against ImageIO's own decode.
      import s.implicits._
      val docs = s.range(50).map { id =>
        val w = 48; val h = 32
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = (64 + x * 2 + id.toInt) & 0xff
            val g = (32 + y * 3 + 2 * id.toInt) & 0xff
            val b = (200 - x + 3 * id.toInt) & 0xff
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        (id, bos.toByteArray)
      }.toDF("doc_id", "jpeg")
      graft.ops.Multimodal.imageFeatures(docs, "doc_id", "jpeg")
    },
    "mm_audio_decode" -> { (s, _) =>
      // REAL WAV PCM-16 decode: 800 samples per doc from a deterministic
      // formula; oracle recomputes the stats from the formula
      import s.implicits._
      val docs = s.range(100).map { id =>
        val samples = Array.tabulate(800)(i => (((i * 37 + id * 13) % 2001) - 1000).toShort)
        (id, graft.ops.Codecs.encodeWavPcm16(samples, 16000))
      }.toDF("doc_id", "wav")
      graft.ops.Multimodal.audioFeatures(docs, "doc_id", "wav")
    },
    "mm_video_frames" -> { (s, _) =>
      // REAL AVI container walk + every-3rd-frame sampling: 40 docs with
      // 12 frames of 64 deterministic bytes each
      import s.implicits._
      val docs = s.range(40).map { id =>
        val frames = (0 until 12).map { fi =>
          Array.tabulate[Byte](64)(j => (((j * 7 + fi * 11 + id * 13) % 256) & 0xff).toByte)
        }
        (id, graft.ops.Codecs.encodeAvi(320, 240, 33333, frames))
      }.toDF("doc_id", "avi")
      graft.ops.Multimodal.videoFrameSample(docs, "doc_id", "avi", stride = 3)
    },
    "mm_mp4_samples" -> { (s, _) =>
      // REAL ISO BMFF box walk (Mp4.decode: mvhd/tkhd + stsz/stsc/stco
      // sample resolution) + every-2nd-sample extraction: 40 docs with
      // 10 variable-size samples of deterministic bytes
      import s.implicits._
      val docs = s.range(40).map { id =>
        val samples = (0 until 10).map { si =>
          Array.tabulate[Byte](32 + (si % 4) * 8)(j =>
            (((j * 5 + si * 17 + id * 29) % 256) & 0xff).toByte)
        }
        (id, graft.ops.Mp4.encode(640, 360, 30000, 1001, samples))
      }.toDF("doc_id", "mp4")
      graft.ops.Multimodal.mp4FrameSample(docs, "doc_id", "mp4", stride = 2)
    },
    "encode_latlng_roundtrip" -> { (s, dir) =>
      // reference-faithful full-cycle encode + atan2 decode must return
      // the original coordinate; rounding both sides to 6 decimals makes
      // the oracle trig-free (the decode error is ~1e-12)
      val enc = graft.ops.Scalers.encodeLatLngRef(Pages.pages(s, dir), "lat", "lon")
      graft.ops.Scalers.decodeLatLng(enc)
        .select(col("doc_id"),
          round(col("lat_dec"), 6).as("lat_rt"), round(col("lng_dec"), 6).as("lng_rt"))
    },
    "select_mix" -> { (s, dir) =>
      // language rebalancing to en .4 / de .2 / fr .2 / es .2 (zh
      // dropped); fr is the binding class so its keep rate is exactly 1
      graft.ops.Selection.sampleToMix(documentsOf(s, dir), "doc_id", "lang",
        Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2))
        .select(col("doc_id"), col("lang"), col("keep_p"))
    },
    "select_systematic" -> { (s, dir) =>
      // token-weighted systematic sample of exactly 100 copies; bucket=64
      // keeps the two-level prefix-sum path live at sf0.01
      val d = documentsOf(s, dir)
      val sized = d.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("w"))
      graft.ops.Selection.systematicSample(sized, k = 100, weightCol = "w",
        bucket = 64)
    },
    "split_by_hash" -> { (s, dir) =>
      // md5prefix family so the DuckDB oracle reproduces every bucket
      // decision; the xxhash64 production family has the same plan shape
      graft.ops.Scalers.splitByHash(documentsOf(s, dir), "doc_id", 80, 10,
        family = "md5prefix")
        .groupBy("split").agg(count(lit(1)).as("n"))
    },

    // --- tiled inference lifecycle (predict_array analog) ---
    "raster_predict_merge" -> { (s, _) =>
      val spec = rasterSpec.copy(bands = 1)
      val tiles = TileOps.createRaster(s, spec)(rasterValue)
      // stand-in model: pixel value + a patch-position-dependent term
      // (a real model predicts from the patch crop, so its output varies
      // with the pixel's position inside the pass's patch). Pass-shifted
      // grids + edge-distance weights + weighted-median merge per the
      // reference lifecycle (prediction.py:103-181).
      graft.tiles.Predict.predictAndMerge(tiles, spec, radius = 1, passes = 2,
        edgeDistance = 2) { (pad, pw, px, py, relX, relY) =>
          pad(py * pw + px) + ((relX * 5 + relY * 3) % 11)
      }
    },

    // --- overlap merge (tiled-prediction reassembly) ---
    "patch_merge_wmedian" -> { (s, _) =>
      // three overlapping prediction passes per pixel, weights 1..3
      val preds = s.range(64L * 64L * 3L).select(
        (col("id") % 64).cast("int").as("x"),
        ((col("id") / 64) % 64).cast("int").as("y"),
        (col("id") / (64 * 64)).cast("int").as("o"))
        .select(col("x"), col("y"),
          ((col("x") * 3 + col("y") * 5 + col("o") * col("o") * 11) % 31).cast("double").as("v"),
          (col("o") + 1).cast("double").as("weight"))
      graft.ops.Merging.mergeWeightedMedian(preds)
    },

    // --- multimodal binary columns (stubbed decode, real plumbing) ---
    "mm_features" -> { (s, dir) =>
      val pages = Pages.pages(s, dir).select("doc_id", "html")
      graft.ops.Multimodal.extractFeatures(pages, "doc_id", "html")
        .select("doc_id", "byte_len", "head_sum")
    },

    // --- event streams ---
    "events_hourly" -> { (s, dir) => Events.hourlyWindows(eventsOf(s, dir)) },
    "events_sessionize" -> { (s, dir) => Events.sessionize(eventsOf(s, dir)) },
    "events_retention" -> { (s, dir) => Events.retention(eventsOf(s, dir)) },
    "events_transitions" -> { (s, dir) => Events.transitions(eventsOf(s, dir)) },
    "events_typestats" -> { (s, dir) => Events.typeStats(eventsOf(s, dir)) }
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

    // haversine mirrored term-for-term (radians/sin/cos/asin/sqrt are
    // 1 ulp apart between JVM and libm — whole-meter BIGINT after the
    // argmin, because ROUND-9 is a no-op at 1e7-meter magnitude; an
    // argmin flip would need two anchors within ~1e-9 relative distance)
    "geo_destination" -> Pages.sqlWith(
      """, d AS (SELECT doc_id, radians(lat) AS la1, radians(lon) AS lo1,
            radians(CAST(doc_id % 360 AS DOUBLE)) AS th,
            (1000.0 * CAST(doc_id % 50 + 1 AS DOUBLE)) / 6378137.0 AS dl
          FROM pages),
        e AS (SELECT doc_id, la1, lo1, th, dl,
            sin(la1) * cos(dl) + cos(la1) * sin(dl) * cos(th) AS sl2 FROM d)
        SELECT doc_id, ROUND(degrees(asin(sl2)), 9) AS dest_lat,
          ROUND(degrees(lo1 + atan2(sin(th) * sin(dl) * cos(la1),
            cos(dl) - sin(la1) * sl2)), 9) AS dest_lon
        FROM e"""),
    // loxodrome mirror: identical operation order; whole-meter distance
    // and ROUND-5 bearing absorb the StrictMath-vs-libm trig/log ulp
    "geo_rhumb" -> Pages.sqlWith(
      s""", anchors(anchor_id, a_lon, a_lat) AS (VALUES ${AnchorFixture.sqlValues}),
        t AS (SELECT p.doc_id, a.anchor_id,
            radians(a.a_lat) - radians(p.lat) AS dphi,
            radians(((a.a_lon - p.lon + 540.0) % 360.0) - 180.0) AS dlam,
            ln(tan(pi() / 4.0 + radians(a.a_lat) / 2.0)
              / tan(pi() / 4.0 + radians(p.lat) / 2.0)) AS dpsi,
            CASE WHEN p.lat = a.a_lat THEN cos(radians(p.lat)) ELSE NULL END AS qflat
          FROM pages p CROSS JOIN anchors a),
        m AS (SELECT doc_id, anchor_id, dphi, dlam, dpsi,
            COALESCE(qflat, dphi / dpsi) AS q,
            degrees(atan2(dlam, dpsi)) AS theta
          FROM t)
        SELECT doc_id, anchor_id,
          CAST(ROUND(sqrt(dphi * dphi + q * q * dlam * dlam) * 6378137.0, 0) AS BIGINT)
            AS rhumb_m,
          ROUND((theta + 360.0) % 360.0, 5) AS bearing_deg
        FROM m"""),
    "geo_haversine" -> Pages.sqlWith(
      s""", anchors(anchor_id, a_lon, a_lat) AS (VALUES ${AnchorFixture.sqlValues}),
        d AS (SELECT p.doc_id, a.anchor_id,
            2.0 * 6378137.0 * asin(LEAST(1.0, sqrt(
              pow(sin(radians(a.a_lat - p.lat) / 2.0), 2)
              + cos(radians(p.lat)) * cos(radians(a.a_lat))
                * pow(sin(radians(a.a_lon - p.lon) / 2.0), 2)))) AS dist_m
          FROM pages p CROSS JOIN anchors a),
        best AS (SELECT doc_id, anchor_id, dist_m,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY dist_m, anchor_id) AS rn FROM d)
        SELECT doc_id, CAST(anchor_id AS BIGINT) AS anchor_id,
          CAST(ROUND(dist_m, 0) AS BIGINT) AS dist_m
        FROM best WHERE rn = 1"""),

    "ann_lsh" -> annLshOracle,
    // both published mirrors nested verbatim; recall fold is pure integers
    "ann_recall" ->
      s"""WITH ex AS (SELECT query_id, neighbor_id FROM ($annTopKOracle)),
        ap AS (SELECT query_id, neighbor_id FROM ($annLshOracle)
          WHERE query_id < 50),
        perq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS kk
          FROM ex GROUP BY query_id),
        hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits
          FROM ex e JOIN ap a USING (query_id, neighbor_id)
          GROUP BY e.query_id)
        SELECT p.query_id, COALESCE(h.hits, 0) AS hits,
          CAST(COALESCE(h.hits, 0) * 1000000 // p.kk AS BIGINT) AS recall_ppm
        FROM perq p LEFT JOIN hits h USING (query_id)""",

    "emb_dup_pairs" ->
      // cosineDupPairs mirror: same banding/cap skeleton as ann_lsh, then
      // exact integer dot + self-dots (order-independent BIGINT sums) and
      // one division by the sqrt product — bitwise-portable
      s"""WITH $sqlEmbPairCtes
        SELECT vec_a, vec_b, dot, cos FROM epairs""",

    "emb_clusters" ->
      // the same verified pair set closed transitively (recursive CTE,
      // min-per-component) — identical connectivity to the engine's
      // star contraction; singletons label themselves
      s"""WITH RECURSIVE $sqlEmbPairCtes,
        eedges AS (SELECT DISTINCT u, v FROM (
          SELECT vec_a AS u, vec_b AS v FROM epairs
          UNION ALL SELECT vec_b, vec_a FROM epairs)),
        ereach(src, dst) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM eedges)
          UNION
          SELECT r.src, e.v FROM ereach r JOIN eedges e ON e.u = r.dst),
        ecomp AS (SELECT src AS vec_id, MIN(dst) AS cluster FROM ereach GROUP BY src)
        SELECT e.vec_id, COALESCE(c.cluster, e.vec_id) AS cluster
        FROM embeddings e LEFT JOIN ecomp c USING (vec_id)""",

    // independent oracle: DuckDB's NATIVE ASOF LEFT JOIN vs our windowed
    // composition — the build side is collapsed to unique (user, ts) by
    // argmax(event_id) in BOTH engines (the operator's contract)
    "events_asof" ->
      """WITH probe AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'error'),
         build AS (SELECT user_id, ts, max(event_id) AS b_event_id,
             arg_max(value, event_id) AS b_value
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT p.event_id, p.user_id, p.ts, p.value,
          b.b_event_id AS asof_event_id, b.ts AS asof_ts,
          b.b_value AS asof_value
        FROM probe p ASOF LEFT JOIN build b
          ON p.user_id = b.user_id AND p.ts >= b.ts""",
    "events_bots" ->
      """WITH g AS (SELECT user_id,
           CAST((epoch_us(ts) - lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
             // 1000000 AS BIGINT) AS g
         FROM events),
        pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
            CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(g * g) AS BIGINT) AS sum_g2
          FROM g WHERE g IS NOT NULL GROUP BY 1
          HAVING count(*) >= 4 AND sum(g) > 0)
        SELECT user_id, n_gaps, sum_g, sum_g2,
          CAST((1000 * (CAST(n_gaps AS HUGEINT) * sum_g2
                        - CAST(sum_g AS HUGEINT) * sum_g))
               // (CAST(n_gaps AS HUGEINT) * sum_g) AS BIGINT) AS vmr_milli,
          (1000 * (CAST(n_gaps AS HUGEINT) * sum_g2
                   - CAST(sum_g AS HUGEINT) * sum_g))
            // (CAST(n_gaps AS HUGEINT) * sum_g) < 200 AS regular
        FROM pu""",

    "emb_outliers" ->
      """WITH q AS (SELECT e.vec_id, CAST(gs.i AS INT) AS pos,
           CAST(round(CAST(e.embedding[gs.i + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS v
         FROM embeddings e, generate_series(0, 63) gs(i)),
        s AS (SELECT pos, CAST(sum(v) AS BIGINT) AS dim_sum,
            CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
        d AS (SELECT q.vec_id,
            CAST(sum(CAST(q.v * s.n - s.dim_sum AS HUGEINT)
                   * (q.v * s.n - s.dim_sum)) AS DECIMAL(38,0)) AS dist2_n2,
            max(s.n) AS n
          FROM q JOIN s ON q.pos = s.pos GROUP BY 1)
        SELECT vec_id, dist2_n2, n, CAST(rnk AS BIGINT) AS rnk
        FROM (SELECT *, row_number() OVER
            (ORDER BY dist2_n2 DESC, vec_id) AS rnk FROM d)
        WHERE rnk <= 20""",

    "events_forecast" ->
      """WITH h AS (SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2)
        SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_hours,
          CAST(sum(abs(a.n - f.n)) AS BIGINT) AS sum_abs_err,
          CAST(sum(a.n) AS BIGINT) AS sum_actual,
          CAST(sum(abs(a.n - f.n)) * 1000 // count(*) AS BIGINT) AS mae_milli
        FROM h a JOIN h f
          ON a.event_type = f.event_type AND a.hour = f.hour + 24
        GROUP BY 1""",

    "events_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct,
           min(k) AS min_k, max(k) AS max_k,
           CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         GROUP BY 1""",

    "events_abtest" ->
      """WITH pu AS (SELECT user_id % 2 AS variant, user_id,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         FROM events GROUP BY 1, 2),
        cells AS (SELECT variant, CAST(count(*) AS BIGINT) AS users,
            CAST(sum(conv) AS BIGINT) AS converted FROM pu GROUP BY 1),
        ab AS (SELECT
          (SELECT users FROM cells WHERE variant = 0) AS users_a,
          (SELECT converted FROM cells WHERE variant = 0) AS conv_a,
          (SELECT users FROM cells WHERE variant = 1) AS users_b,
          (SELECT converted FROM cells WHERE variant = 1) AS conv_b)
        SELECT users_a, conv_a, users_b, conv_b,
          CAST((users_a + users_b)
            * CAST(conv_a*(users_b-conv_b) - conv_b*(users_a-conv_a) AS HUGEINT)
            * CAST(conv_a*(users_b-conv_b) - conv_b*(users_a-conv_a) AS HUGEINT)
            AS DECIMAL(38,0)) AS chi2_num,
          CAST(CAST(users_a AS HUGEINT) * users_b * (conv_a + conv_b)
            * (users_a + users_b - conv_a - conv_b) AS DECIMAL(38,0)) AS chi2_den,
          CAST((users_a + users_b)
            * CAST(conv_a*(users_b-conv_b) - conv_b*(users_a-conv_a) AS HUGEINT)
            * CAST(conv_a*(users_b-conv_b) - conv_b*(users_a-conv_a) AS HUGEINT)
            AS HUGEINT) * 1000000
          >= CAST(CAST(users_a AS HUGEINT) * users_b * (conv_a + conv_b)
            * (users_a + users_b - conv_a - conv_b) AS HUGEINT) * 3841459
            AS significant
        FROM ab""",

    "events_scd2" ->
      """WITH c AS (SELECT user_id, ts, event_type, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_v
         FROM events),
        f AS (SELECT user_id, ts, event_type, event_id FROM c
              WHERE prev_v IS NULL OR prev_v <> event_type)
        SELECT user_id, event_type, ts AS effective_from,
          lead(ts) OVER w AS effective_to,
          CAST(row_number() OVER w AS BIGINT) AS version,
          lead(ts) OVER w IS NULL AS is_current
        FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",

    "events_rollup" ->
      """SELECT COALESCE(event_type, 'ALL') AS event_type,
           CAST(COALESCE(hod, -1) AS INT) AS hod,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(vq) AS BIGINT) AS value_q
         FROM (SELECT event_type,
             CAST(floor(epoch_us(ts) / 3600000000.0) % 24 AS INT) AS hod,
             CAST(round(value * 10000.0) AS BIGINT) AS vq
           FROM events)
         GROUP BY ROLLUP (event_type, hod)""",

    "events_cusum" ->
      """WITH h AS (SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
        w AS (SELECT event_type, hour, n,
           sum(n - 1) OVER (PARTITION BY event_type ORDER BY hour
                            ROWS UNBOUNDED PRECEDING) AS p
         FROM h)
        SELECT event_type, hour, n,
          CAST(p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY hour
                                         ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS s,
          p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY hour
                                    ROWS UNBOUNDED PRECEDING)) >= 5 AS alarm
        FROM w""",

    "events_anomaly" ->
      """WITH h AS (SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2)
        SELECT event_type, hour, n,
          CAST(COALESCE(sum(n) OVER tw, 0) AS BIGINT) AS prev_sum,
          CAST(count(n) OVER tw AS BIGINT) AS prev_hours,
          CASE WHEN COALESCE(sum(n) OVER tw, 0) = 0 THEN NULL
               ELSE CAST(n * 24 * 1000000 // sum(n) OVER tw AS BIGINT) END AS spike_ppm
        FROM h
        WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)""",

    "geo_pyramid" -> Pages.sqlWith {
      val levels = (4 to 8).map { l =>
        s"SELECT doc_id, ${sqlGridId(l, Pages.sqlCellX(l), Pages.sqlCellY(l))} AS cell FROM pages"
      }.mkString(" UNION ALL ")
      s"""SELECT cell, CAST(count(*) AS BIGINT) AS n_pages, min(doc_id) AS min_doc
        FROM ($levels) GROUP BY 1"""
    },

    "geo_hotspots" -> Pages.sqlWith(
      s""", cc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS v FROM (
            SELECT ${Pages.sqlCellX(7)} AS x, ${Pages.sqlCellY(7)} AS y FROM pages)
          GROUP BY 1, 2),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s FROM cc),
        sten AS (SELECT x + dx AS x, y + dy AS y, v FROM cc
                 CROSS JOIN (VALUES (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)) o(dx, dy)),
        nb AS (SELECT x, y, CAST(sum(v) AS BIGINT) AS nbr_sum,
                 CAST(count(*) AS BIGINT) AS nbr_n FROM sten GROUP BY 1, 2)
        SELECT cc.x, cc.y, cc.v, nb.nbr_n, nb.nbr_sum,
          (CASE WHEN CAST(st.n AS HUGEINT) * nb.nbr_sum - CAST(nb.nbr_n AS HUGEINT) * st.s < 0
                THEN -1 ELSE 1 END)
            * CAST(abs(CAST(st.n AS HUGEINT) * nb.nbr_sum - CAST(nb.nbr_n AS HUGEINT) * st.s)
                   * 1000000 // (CAST(nb.nbr_n AS HUGEINT) * st.s) AS BIGINT) AS excess_ppm
        FROM cc JOIN nb ON nb.x = cc.x AND nb.y = cc.y, st"""),

    "geo_hilbert" -> Pages.sqlWith(
      s""", hb0 AS (SELECT doc_id, ${Pages.sqlCellX(7)} AS x,
            ${Pages.sqlCellY(7)} AS y, CAST(0 AS BIGINT) AS d FROM pages),
        ${sqlHilbert(7)}
        SELECT doc_id, d AS hd FROM hb7"""),

    "geo_cell_skew" -> Pages.sqlWith(
      s""", cc AS (SELECT cell, CAST(count(*) AS BIGINT) AS v FROM (
            SELECT ${Pages.sqlCellX(7)} * 128 + ${Pages.sqlCellY(7)} AS cell FROM pages)
          GROUP BY 1),
        rk AS (SELECT cell, v, row_number() OVER (ORDER BY v, cell) AS i FROM cc),
        ag AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(sum(v) AS BIGINT) AS total, max(v) AS v_max,
                 min(CASE WHEN v = (SELECT max(v) FROM rk) THEN cell END) AS top_cell,
                 CAST(sum(CAST(i AS HUGEINT) * 2 * v) AS HUGEINT) AS ri2
               FROM rk)
        SELECT n_cells, total, v_max, top_cell,
          CAST(v_max * 1000000 // total AS BIGINT) AS top_share_ppm,
          CAST((ri2 - CAST(n_cells + 1 AS HUGEINT) * total) * 1000000
               // (CAST(n_cells AS HUGEINT) * total) AS BIGINT) AS gini_ppm
        FROM ag"""),

    "geo_moran" -> Pages.sqlWith(
      s""", cc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS v FROM (
            SELECT ${Pages.sqlCellX(7)} AS x, ${Pages.sqlCellY(7)} AS y FROM pages)
          GROUP BY 1, 2),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s FROM cc),
        d AS (SELECT x, y, CAST(st.n * cc.v - st.s AS HUGEINT) AS dev FROM cc, st),
        pr AS (SELECT a.dev * b.dev AS p FROM d a JOIN d b ON b.x = a.x + 1 AND b.y = a.y
               UNION ALL
               SELECT a.dev * b.dev AS p FROM d a JOIN d b ON b.x = a.x AND b.y = a.y + 1),
        nf AS (SELECT COALESCE(sum(p), CAST(0 AS HUGEINT)) AS num_u,
                 CAST(count(*) AS BIGINT) AS u_pairs FROM pr),
        df AS (SELECT sum(dev * dev) AS den FROM d)
        SELECT st.n AS n_cells, st.s AS sum_v, nf.u_pairs * 2 AS w_pairs,
          CAST(nf.num_u * 2 AS BIGINT) AS num2, CAST(df.den AS BIGINT) AS den,
          CASE WHEN nf.u_pairs = 0 OR df.den = 0 THEN 0
               ELSE (CASE WHEN nf.num_u < 0 THEN -1 ELSE 1 END)
                 * CAST(abs(nf.num_u * 2) * st.n * 1000000
                        // (nf.u_pairs * 2 * df.den) AS BIGINT) END AS moran_ppm
        FROM st, nf, df"""),

    "geo_geohash" -> Pages.sqlWith(
      s", ${sqlGeohash(8)} SELECT doc_id, gh8, substr(gh8, 1, 4) AS gh4 FROM gh"),

    "geo_s2_cells" -> Pages.sqlWith(
      s", ${sqlS2Cell(10)} SELECT s2, CAST(count(*) AS BIGINT) AS n_pages, " +
        "min(doc_id) AS min_doc FROM s2cell GROUP BY s2"),

    "geo_s2_rollup" -> Pages.sqlWith(
      s", ${sqlS2Cell(7)} SELECT s2, CAST(count(*) AS BIGINT) AS n_pages, " +
        "min(doc_id) AS min_doc FROM s2cell GROUP BY s2"),

    "encode_latlng" -> Pages.sqlWith(
      """SELECT doc_id,
          ROUND(sin((lat + 90.0) / 180.0 * pi()), 9) AS lat_sin_r,
          ROUND(cos((lat + 90.0) / 180.0 * pi()), 9) AS lat_cos_r,
          ROUND(sin((lon + 180.0) / 360.0 * (2 * pi())), 9) AS lng_sin_r,
          ROUND(cos((lon + 180.0) / 360.0 * (2 * pi())), 9) AS lng_cos_r
        FROM pages"""),

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

    "geo_cell_uncompact" -> Pages.sqlWith(
      s""", cxy AS (SELECT ${Pages.sqlCellX(7)} AS x, ${Pages.sqlCellY(7)} AS y
            FROM pages WHERE doc_id % 3 = 0),
          c7 AS (SELECT DISTINCT ${sqlGridId(7, "x", "y")} AS cell FROM cxy)
        SELECT ${9L << 58} + (cell % ${1L << 58}) * 16 + t AS cell
        FROM c7 CROSS JOIN $sqlVals16"""),

    "geo_cell_compact" -> Pages.sqlWith {
      val pChain = (8 to 0 by -1).map { l =>
        val src = if (l == 8) "s9" else s"p${l + 1}"
        s"p$l AS (SELECT ${sqlGridParent("cell")} AS cell FROM $src GROUP BY 1 HAVING count(*) = 4)"
      }.mkString(",\n          ")
      val allUnion = (8 to 0 by -1).map(l => s"UNION ALL SELECT cell FROM p$l").mkString(" ")
      s""", exy AS (SELECT ${Pages.sqlCellX(7)} AS x, ${Pages.sqlCellY(7)} AS y
            FROM pages WHERE doc_id % 2 = 0),
          e7 AS (SELECT DISTINCT ${sqlGridId(7, "x", "y")} AS cell FROM exy),
          s9 AS (SELECT DISTINCT cell FROM (
            SELECT ${9L << 58} + (cell % ${1L << 58}) * 16 + t AS cell
            FROM e7 CROSS JOIN $sqlVals16
            UNION ALL
            SELECT ${sqlGridId(9, Pages.sqlCellX(9), Pages.sqlCellY(9))} AS cell
            FROM pages WHERE doc_id % 2 = 1) u),
          $pChain,
          allc AS (SELECT cell FROM s9 $allUnion)
        SELECT cell, CAST(cell // ${1L << 58} AS INT) AS lvl FROM allc
        WHERE cell // ${1L << 58} = 0
           OR ${sqlGridParent("cell")} NOT IN (SELECT cell FROM allc)"""
    },

    // the adaptive-cover prefilter is lossless (covers are supersets of
    // their polygons and prefix-free), so the oracle is plain PIP — the
    // equality IS the end-to-end correctness proof of the prefilter
    "geo_cover_pip" -> Pages.sqlWith(
      s"""SELECT CAST(poly_id AS BIGINT) AS poly_id, count(*) AS n_pages,
          min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM pages JOIN ${Fixtures.sqlRectValues}
          ON lon >= x_min AND lon <= x_max AND lat >= y_min AND lat <= y_max
        GROUP BY 1"""),

    "geo_s2_compact" -> Pages.sqlWith {
      val pChain = (9 to 0 by -1).map { l =>
        val src = if (l == 9) "s10" else s"q${l + 1}"
        s"q$l AS (SELECT ${sqlS2ParentN("cell", 1)} AS cell FROM $src GROUP BY 1 HAVING count(*) = 4)"
      }.mkString(",\n          ")
      val allUnion = (9 to 0 by -1).map(l => s"UNION ALL SELECT cell FROM q$l").mkString(" ")
      s""", ${sqlS2Cell(10)},
          e8 AS (SELECT DISTINCT ${sqlS2ParentN("s2", 2)} AS cell
            FROM s2cell WHERE doc_id % 2 = 0),
          s10 AS (SELECT DISTINCT cell FROM (
            SELECT ((cell & $s2FaceMask) + ${10L * (1L << 56)}
                    + ((cell & $s2MortonMask) * 16) + t) AS cell
            FROM e8 CROSS JOIN $sqlVals16
            UNION ALL
            SELECT s2 AS cell FROM s2cell WHERE doc_id % 2 = 1) u),
          $pChain,
          allc AS (SELECT cell FROM s10 $allUnion)
        SELECT cell, CAST(${sqlS2Lvl("cell")} AS INT) AS lvl FROM allc
        WHERE ${sqlS2Lvl("cell")} = 0
           OR ${sqlS2ParentN("cell", 1)} NOT IN (SELECT cell FROM allc)"""
    },

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

    "geo_knn_cell" -> Pages.sqlWith(
      """SELECT query_id, neighbor_id, dist2, CAST(rank AS INTEGER) AS rank FROM (
          SELECT p.doc_id AS query_id, t.doc_id AS neighbor_id,
            (p.lon_udeg - t.lon_udeg) * (p.lon_udeg - t.lon_udeg)
              + (p.lat_udeg - t.lat_udeg) * (p.lat_udeg - t.lat_udeg) AS dist2,
            row_number() OVER (PARTITION BY p.doc_id ORDER BY
              (p.lon_udeg - t.lon_udeg) * (p.lon_udeg - t.lon_udeg)
                + (p.lat_udeg - t.lat_udeg) * (p.lat_udeg - t.lat_udeg), t.doc_id) AS rank
          FROM pages p JOIN pages t ON t.doc_id <> p.doc_id) WHERE rank <= 3"""),

    "vector_nearest" -> Pages.sqlWith(
      s""", scored AS (
          SELECT doc_id, poly_id,
            greatest(x_min - lon, lon - x_max, 0) AS dx,
            greatest(y_min - lat, lat - y_max, 0) AS dy
          FROM pages CROSS JOIN ${Fixtures.sqlRectValues}),
        r AS (SELECT doc_id, poly_id, dx * dx + dy * dy AS dist2,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY dx * dx + dy * dy, poly_id) AS rn FROM scored)
        SELECT doc_id, CAST(poly_id AS BIGINT) AS nearest_id, dist2
        FROM r WHERE rn = 1"""),

    "geo_pair_join" -> Pages.sqlWith(
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          (a.lon_udeg - b.lon_udeg) * (a.lon_udeg - b.lon_udeg)
            + (a.lat_udeg - b.lat_udeg) * (a.lat_udeg - b.lat_udeg) AS dist2
        FROM pages a JOIN pages b
          ON a.doc_id < b.doc_id
         AND (a.lon_udeg - b.lon_udeg) * (a.lon_udeg - b.lon_udeg)
            + (a.lat_udeg - b.lat_udeg) * (a.lat_udeg - b.lat_udeg)
            <= 4000000000000"""),

    "geo_snap_roads" -> Pages.sqlWith(
      s""", segs AS (SELECT * FROM (VALUES $roadSegsSql)
             AS t(seg_id, ax, ay, bx, by)),
         pts AS (SELECT doc_id, lon_udeg AS x, lat_udeg AS y
           FROM pages WHERE doc_id % 10 = 0),
         c2 AS (SELECT p.doc_id, s.seg_id, p.x, p.y, s.bx, s.by,
             (s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay) AS r,
             (p.x - s.ax) * (s.bx - s.ax) + (p.y - s.ay) * (s.by - s.ay) AS dot,
             (p.x - s.ax) * (p.x - s.ax) + (p.y - s.ay) * (p.y - s.ay) AS w2
           FROM pts p CROSS JOIN segs s),
         scored AS (SELECT doc_id, seg_id,
             CASE WHEN dot <= 0 THEN 'a' WHEN dot >= r THEN 'b'
                  ELSE 'mid' END AS snap_case,
             CAST(CASE WHEN dot <= 0 THEN w2
                  WHEN dot >= r THEN (x - bx) * (x - bx) + (y - by) * (y - by)
                  ELSE w2 * r - dot * dot END AS BIGINT) AS dist_num,
             CAST(CASE WHEN dot <= 0 OR dot >= r THEN 1 ELSE r END AS BIGINT)
               AS dist_den
           FROM c2)
        SELECT c.doc_id, c.seg_id, c.snap_case, c.dist_num, c.dist_den
        FROM scored c
        WHERE NOT EXISTS (SELECT 1 FROM scored o WHERE o.doc_id = c.doc_id
          AND (CAST(o.dist_num AS HUGEINT) * c.dist_den
                 < CAST(c.dist_num AS HUGEINT) * o.dist_den
               OR (CAST(o.dist_num AS HUGEINT) * c.dist_den
                     = CAST(c.dist_num AS HUGEINT) * o.dist_den
                   AND o.seg_id < c.seg_id)))"""),
    "geo_range_join" -> Pages.sqlWith(
      """SELECT pr.doc_id AS probe_id, t.doc_id AS target_id,
          (t.lon_udeg - pr.lon_udeg) * (t.lon_udeg - pr.lon_udeg)
            + (t.lat_udeg - pr.lat_udeg) * (t.lat_udeg - pr.lat_udeg) AS dist2
        FROM pages t JOIN pages pr
          ON pr.doc_id < 40
         AND (t.lon_udeg - pr.lon_udeg) * (t.lon_udeg - pr.lon_udeg)
            + (t.lat_udeg - pr.lat_udeg) * (t.lat_udeg - pr.lat_udeg)
            <= 9000000000000"""),

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

    "raster_zonal_full" -> zonalFullOracle,

    // closed-form rect∩cell overlap; sixteenth-aligned zones keep every
    // fraction, product, and partial sum an exact binary fraction on
    // both engines, so the clip+shoelace path must match bitwise
    "raster_zonal_weighted" -> (sqlPx +
      s""" SELECT CAST(zone AS BIGINT) AS zone, band,
          CAST(count(*) AS BIGINT) AS n_cells,
          sum(frac) AS cov_px, sum(v * frac) AS wsum,
          sum(v * frac) / sum(frac) AS wmean
        FROM (SELECT zone, band, v,
            (LEAST(zx1, (x + 1) * 0.25) - GREATEST(zx0, x * 0.25))
            * (LEAST(zy1, 64.0 - y * 0.25) - GREATEST(zy0, 64.0 - (y + 1) * 0.25))
            / 0.0625 AS frac
          FROM px JOIN $sqlWZones
            ON (x + 1) * 0.25 > zx0 AND x * 0.25 < zx1
            AND 64.0 - y * 0.25 > zy0 AND 64.0 - (y + 1) * 0.25 < zy1)
        WHERE frac > 0 GROUP BY 1, 2"""),

    "raster_convolve_sum" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, (sum(b.v) * 9.0) / count(*) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_convolve_median" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, median(b.v) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_align" ->
      """WITH refpx AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           0.0 + (x + 0.5) * 0.25 AS gx, 64.0 + (y + 0.5) * -0.25 AS gy
         FROM range(256) r1(x), range(256) r2(y)),
        sampled AS (SELECT x, y,
           CAST(floor((gx - 3.0) / 0.25) AS INTEGER) AS sc,
           CAST(floor((gy - 61.0) / -0.25) AS INTEGER) AS sr
         FROM refpx),
        vals AS (SELECT x, y, CAST((sc * 11 + sr * 3) % 89 AS DOUBLE) AS v
         FROM sampled WHERE sc >= 0 AND sc < 192 AND sr >= 0 AND sr < 192)
        SELECT CAST(x // 64 AS INTEGER) AS cell_x, CAST(y // 64 AS INTEGER) AS cell_y,
          0 AS band, min(v) AS vmin, max(v) AS vmax,
          CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS vsum, CAST(count(*) AS BIGINT) AS n_px
        FROM vals GROUP BY 1, 2""",

    "raster_erode" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, min(b.v) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_open" -> (sqlPxConv +
      """, ero AS (SELECT a.x, a.y, a.band, min(b.v) AS v
          FROM px a JOIN px b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3)
        SELECT a.x, a.y, a.band, max(b.v) AS v
        FROM ero a JOIN ero b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_stack" -> (sqlPx +
      """, px2 AS (SELECT x, y, band, v FROM px UNION ALL
          SELECT CAST(x AS INTEGER), CAST(y AS INTEGER), 2 AS band,
            CAST((x * 11 + y * 3) % 89 AS DOUBLE) AS v
          FROM range(256) r1(x), range(256) r2(y))
        SELECT CAST(x // 64 AS INTEGER) AS cell_x, CAST(y // 64 AS INTEGER) AS cell_y,
          band, min(v) AS vmin, max(v) AS vmax,
          CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS vsum, CAST(count(*) AS BIGINT) AS n_px
        FROM px2 GROUP BY 1, 2, 3"""),

    "raster_mosaic" ->
      // ref pixels always carry raster A; raster B contributes where the
      // align sample (floor grid math, as in raster_align) lands in range
      """WITH refpx AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST((x*7 + y*13) % 97 AS DOUBLE) AS va,
           CAST(floor((0.0 + (x + 0.5) * 0.25 - 3.0) / 0.25) AS INTEGER) AS sc,
           CAST(floor((64.0 + (y + 0.5) * -0.25 - 61.0) / -0.25) AS INTEGER) AS sr
         FROM range(256) r1(x), range(256) r2(y))
        SELECT x, y, 0 AS band,
          CASE WHEN sc >= 0 AND sc < 192 AND sr >= 0 AND sr < 192
               THEN (va + CAST((sc * 11 + sr * 3) % 89 AS DOUBLE)) / 2
               ELSE va END AS v
        FROM refpx""",

    "raster_timeslope" ->
      """WITH px4 AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST(b AS INTEGER) AS band,
           CAST((x*5 + y*3 + b*b*7) % 53 AS DOUBLE) AS v
         FROM range(256) r1(x), range(256) r2(y), range(4) r3(b)),
        sums AS (SELECT x, y, sum(band * v) AS sty, sum(v) AS sy
         FROM px4 GROUP BY x, y)
        SELECT x, y, 0 AS band, (4.0 * sty - 6.0 * sy) / 20.0 AS v FROM sums""",

    "text_bpe_tokens" ->
      // IDENTICAL regex runs under RE2 here and Java regex in the engine
      // (pattern is lookahead-free by construction)
      """SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT)
            AS n_pretokens,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
            AS n_ws_tokens
        FROM documents""",

    // marker-free run counting (len(sub(p,'x')) - len(sub(p,''))) and
    // truncating integer division on positive operands — no FP anywhere,
    // so the ppm scores hash-exact
    "text_readability" -> (sqlToks + """,
        base AS (SELECT d.doc_id,
          GREATEST(COALESCE(tc.n, 0), 1) AS n_words,
          GREATEST(length(regexp_replace(lower(d.text), '[.!?]+', 'x', 'g'))
            - length(regexp_replace(lower(d.text), '[.!?]+', '', 'g')), 1) AS n_sents,
          length(regexp_replace(lower(d.text), '[aeiouy]+', 'x', 'g'))
            - length(regexp_replace(lower(d.text), '[aeiouy]+', '', 'g')) AS n_syll,
          length(regexp_replace(d.text, '\s', '', 'g')) AS n_chars_ns
        FROM documents d LEFT JOIN
          (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id) tc USING (doc_id))
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
          CAST(n_sents AS BIGINT) AS n_sents, CAST(n_syll AS BIGINT) AS n_syll,
          CAST(n_chars_ns AS BIGINT) AS n_chars_ns,
          CAST(206835000 - (1015000 * n_words) // n_sents
            - (84600000 * n_syll) // n_words AS BIGINT) AS flesch_ppm,
          CAST((4710000 * n_chars_ns) // n_words
            + (500000 * n_words) // n_sents - 21430000 AS BIGINT) AS ari_ppm
        FROM base"""),
    "text_stats" -> (sqlToks +
      """ SELECT d.doc_id, length(d.text) AS n_chars,
          COALESCE(tc.n_tokens, 0) AS n_tokens,
          COALESCE(tc.n_distinct, 0) AS n_distinct,
          length(d.text) - length(replace(d.text, ' ', '')) AS n_spaces
        FROM documents d LEFT JOIN
          (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
           FROM toks GROUP BY doc_id) tc USING (doc_id)"""),

    "text_quality" -> (sqlToks +
      """ SELECT d.doc_id,
          CAST(COALESCE(tc.n_tokens, 0) AS DOUBLE) / (CAST(length(d.text) AS DOUBLE) + 1.0) AS density,
          CAST(COALESCE(tc.n_distinct, 0) AS DOUBLE) / (CAST(COALESCE(tc.n_tokens, 0) AS DOUBLE) + 1.0) AS distinct_ratio
        FROM documents d LEFT JOIN
          (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
           FROM toks GROUP BY doc_id) tc USING (doc_id)"""),

    "text_scripts" -> scriptProfileOracle,

    "text_chi2_features" -> (sqlToks +
      """, pres AS (SELECT d.lang, t.tok, CAST(count(*) AS BIGINT) AS a
           FROM dtoks t JOIN documents d ON t.doc_id = d.doc_id
           GROUP BY 1, 2),
        nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
               FROM documents GROUP BY 1),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        dft AS (SELECT tok, CAST(sum(a) AS BIGINT) AS df FROM pres GROUP BY 1),
        sc AS (SELECT p.lang, p.tok, p.a, dft.df,
            CAST((1000000 * nt.n_docs *
                  CAST(p.a * (nt.n_docs - nl.n_lang - (dft.df - p.a))
                       - (nl.n_lang - p.a) * (dft.df - p.a) AS HUGEINT)
                * CAST(p.a * (nt.n_docs - nl.n_lang - (dft.df - p.a))
                       - (nl.n_lang - p.a) * (dft.df - p.a) AS HUGEINT))
              // (CAST(nl.n_lang AS HUGEINT) * (nt.n_docs - nl.n_lang)
                 * dft.df * (nt.n_docs - dft.df)) AS BIGINT) AS score_ppm
          FROM pres p JOIN nl ON p.lang = nl.lang
          JOIN dft ON p.tok = dft.tok CROSS JOIN nt
          WHERE dft.df < nt.n_docs)
        SELECT lang, tok, a, df, score_ppm,
          CAST(rnk AS BIGINT) AS rnk
        FROM (SELECT *, row_number() OVER
            (PARTITION BY lang ORDER BY score_ppm DESC, tok) AS rnk FROM sc)
        WHERE rnk <= 5"""),

    "text_langid" -> langidOracle,

    "text_langid_eval" ->
      s"""WITH pred AS (SELECT doc_id, lang, pred_lang FROM ($langidOracle)),
         conf AS (SELECT lang AS true_lang, pred_lang,
             CAST(count(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(CASE WHEN lang = pred_lang THEN 1 END) AS BIGINT)
               AS n_correct FROM pred)
        SELECT true_lang, pred_lang, n, n_docs, n_correct,
          CAST(n_correct * 1000000 // n_docs AS BIGINT) AS accuracy_ppm
        FROM conf CROSS JOIN tot""",

    "text_fingerprint" ->
      "SELECT doc_id, md5(replace(text, ' ', '')) AS fp FROM documents",

    "text_winnow" ->
      // winnowing (k=4, w=4): 0-based gram positions; per-doc window-min
      // with rightmost tie-break (max gpos among h = window min); the
      // DISTINCT mirrors Spark's within-doc array_distinct. The frame
      // CURRENT ROW..3 FOLLOWING truncates at the partition end exactly
      // like Spark's least(j+w-1, nG-1) window cap, and j is restricted
      // to real window starts (one truncated window when n_grams < w).
      """WITH tl AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS l
           FROM documents),
         grams AS (SELECT doc_id, pos - 1 AS gpos,
             CAST('0x' || substr(md5(array_to_string(l[pos:pos+3], ' ')), 1, 15) AS BIGINT) AS h,
             len(l) - 3 AS ng
           FROM (SELECT doc_id, l, unnest(l) AS _t,
                   generate_subscripts(l, 1) AS pos FROM tl)
           WHERE pos <= len(l) - 3),
         wmins AS (SELECT doc_id, gpos AS j, ng,
             min(h) OVER (PARTITION BY doc_id ORDER BY gpos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
           FROM grams),
         wsel AS (SELECT doc_id, j, m FROM wmins
                  WHERE j <= greatest(ng - 4, 0)),
         fps AS (SELECT s.doc_id, s.j, s.m, max(g.gpos) AS pos
           FROM wsel s JOIN grams g
             ON g.doc_id = s.doc_id AND g.gpos BETWEEN s.j AND s.j + 3
            AND g.h = s.m
           GROUP BY s.doc_id, s.j, s.m)
       SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, m AS fp FROM fps""",

    "text_winnow_pairs" ->
      // pairs sharing >= 2 winnow fingerprints (uncapped — exact mirror)
      """WITH tl AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS l
           FROM documents),
         grams AS (SELECT doc_id, pos - 1 AS gpos,
             CAST('0x' || substr(md5(array_to_string(l[pos:pos+3], ' ')), 1, 15) AS BIGINT) AS h,
             len(l) - 3 AS ng
           FROM (SELECT doc_id, l, unnest(l) AS _t,
                   generate_subscripts(l, 1) AS pos FROM tl)
           WHERE pos <= len(l) - 3),
         wmins AS (SELECT doc_id, gpos AS j, ng,
             min(h) OVER (PARTITION BY doc_id ORDER BY gpos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
           FROM grams),
         wsel AS (SELECT doc_id, j, m FROM wmins
                  WHERE j <= greatest(ng - 4, 0)),
         fdist AS (SELECT DISTINCT doc_id, m AS fp FROM wsel)
       SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
       FROM fdist a JOIN fdist b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY 1, 2
       HAVING count(*) >= 2""",

    "text_substr_dedup" ->
      // exact-substring dedup over 8-token windows: duplicated windows
      // keep the min-packed occurrence; losers erase their span.
      // generate_subscripts is 1-based vs Spark's 0-based — a uniform
      // shift, so winners and span coverage match exactly.
      """WITH tl AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS l
           FROM documents),
         occ AS (SELECT doc_id, pos, array_to_string(l[pos:pos+7], ' ') AS wkey
           FROM (SELECT doc_id, l, unnest(l) AS _t,
                   generate_subscripts(l, 1) AS pos FROM tl)
           WHERE pos + 7 <= len(l)),
         wins AS (SELECT wkey, min(doc_id*1048576 + pos) AS winner, count(*) AS c
                  FROM occ GROUP BY wkey),
         losers AS (SELECT o.doc_id, o.pos FROM occ o JOIN wins w ON o.wkey = w.wkey
                    WHERE w.c > 1 AND o.doc_id*1048576 + o.pos <> w.winner),
         tokpos AS (SELECT doc_id, unnest(l) AS tok,
                    generate_subscripts(l, 1) AS pos FROM tl),
         removed AS (SELECT DISTINCT t.doc_id, t.pos FROM tokpos t JOIN losers s
                     ON t.doc_id = s.doc_id AND s.pos <= t.pos AND t.pos < s.pos + 8),
         kept AS (SELECT t.doc_id, t.pos, t.tok FROM tokpos t
                  LEFT JOIN removed r ON t.doc_id = r.doc_id AND t.pos = r.pos
                  WHERE r.pos IS NULL),
         rebuilt AS (SELECT doc_id, count(*) AS n_kept,
                     string_agg(tok, ' ' ORDER BY pos) AS clean_text
                     FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
            - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
          COALESCE(r.clean_text, '') AS clean_text
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)""",

    "text_segment_dedup" ->
      // C4-style first-occurrence segment dedup; winner = min packed
      // (doc_id·2^20 + pos). generate_subscripts is 1-based vs Spark's
      // 0-based posexplode — a uniform per-doc shift, so the SAME
      // occurrence wins and the ORDER BY pos reassembly is identical.
      """WITH occ AS (
           SELECT doc_id, pos, line FROM (
             SELECT doc_id,
                    unnest(string_split(text, ' ')) AS line,
                    generate_subscripts(string_split(text, ' '), 1) AS pos
             FROM documents)
           WHERE line <> ''),
         win AS (SELECT line, min(doc_id * 1048576 + pos) AS winner
                 FROM occ GROUP BY line),
         kept AS (SELECT o.doc_id, o.pos, o.line FROM occ o JOIN win w
                  ON o.line = w.line AND o.doc_id * 1048576 + o.pos = w.winner),
         rebuilt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                     string_agg(line, ' ' ORDER BY pos) AS clean_text
                     FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS n_lines,
          COALESCE(r.n_kept, 0) AS n_kept,
          COALESCE(r.clean_text, '') AS clean_text
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)""",

    "text_fix_encoding" ->
      // closed-form ground truth of the planted corruption lattice:
      // cases 1/2/4 repair to the real char (chr = Unicode codepoint),
      // case 3 is genuine Latin-1 (invalid as UTF-8 bytes -> untouched),
      // case 0 is pure ASCII (round-trips equal -> untouched)
      """SELECT doc_id,
           CASE doc_id % 5
             WHEN 1 THEN text || ' caf' || chr(233)
             WHEN 2 THEN text || ' x' || chr(233)
             WHEN 3 THEN text || ' caf' || chr(233)
             WHEN 4 THEN text || ' y' || chr(28450)
             ELSE text END AS fixed,
           (doc_id % 5) IN (1, 2, 4) AS changed
         FROM documents""",

    "text_gopher_rules" ->
      // exact integer counts + single IEEE divisions → bitwise-portable,
      // so even the composite boolean matches
      """WITH m AS (SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
           -- sum of token lengths == count of non-space characters
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS sum_len,
           CAST(len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS n_stop,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
           CAST(length(text) AS BIGINT) AS n_chars
         FROM documents)
        SELECT doc_id, n_tokens,
          CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
          n_stop,
          CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) AS alpha_ratio,
          (n_tokens >= 20 AND n_tokens <= 100000
            AND CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 3.0
            AND CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 10.0
            AND n_stop >= 2
            AND CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) >= 0.7) AS passes
        FROM m""",

    "text_repetition" ->
      // Gopher repetition family at word/bigram granularity. Positions:
      // Spark builds bigrams from the FILTERED token array, so the SQL
      // re-ranks filtered tokens with row_number before the rn+1 self
      // join. Argmax tie-break (count desc, gram desc) is total, so both
      // engines pick the same bigram. Exact ints + one IEEE division.
      """WITH occ AS (
           SELECT doc_id,
                  row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
                  tok
           FROM (SELECT doc_id,
                        unnest(string_split(text, ' ')) AS tok,
                        generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents)
           WHERE tok <> ''),
         base AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents),
         tokcnt AS (SELECT doc_id, tok, count(*) AS cnt FROM occ GROUP BY doc_id, tok),
         perdoc AS (SELECT doc_id,
                    CAST(sum(cnt) AS BIGINT) AS n_tokens,
                    CAST(count(*) AS BIGINT) AS n_distinct,
                    CAST(sum(cnt * length(tok)) AS BIGINT) AS tok_chars,
                    CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(tok) ELSE 0 END) AS BIGINT) AS dup_tok_chars
                    FROM tokcnt GROUP BY doc_id),
         grams AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS gram
                   FROM occ a JOIN occ b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
         gramcnt AS (SELECT doc_id, gram, count(*) AS gcnt FROM grams GROUP BY doc_id, gram),
         top AS (SELECT doc_id, gram AS top_bigram, CAST(gcnt AS BIGINT) AS top_bigram_cnt
                 FROM (SELECT doc_id, gram, gcnt,
                       row_number() OVER (PARTITION BY doc_id ORDER BY gcnt DESC, gram DESC) AS rn
                       FROM gramcnt) WHERE rn = 1)
        SELECT p.doc_id, p.n_tokens,
          CAST(p.n_tokens - p.n_distinct AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) AS dup_tok_frac,
          CAST(p.dup_tok_chars AS DOUBLE) / CAST(p.tok_chars AS DOUBLE) AS dup_char_frac,
          COALESCE(t.top_bigram, '') AS top_bigram,
          COALESCE(t.top_bigram_cnt, 0) AS top_bigram_cnt,
          CAST(COALESCE(t.top_bigram_cnt, 0) * length(COALESCE(t.top_bigram, '')) AS DOUBLE)
            / CAST(b.n_chars AS DOUBLE) AS top_bigram_char_frac
        FROM perdoc p JOIN base b USING (doc_id) LEFT JOIN top t USING (doc_id)""",

    "url_reg_domain" ->
      // closed-form per-pattern expected values (publicsuffix.org
      // semantics worked out by hand), independent of the join recipe
      """WITH h AS (SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS g,
           doc_id % 8 AS m FROM documents)
         SELECT doc_id,
           CASE m WHEN 0 THEN 'www.site' || g || '.co.uk'
                  WHEN 1 THEN 'blog.site' || g || '.com'
                  WHEN 2 THEN 'site' || g || '.gov.uk'
                  WHEN 3 THEN 'a.b.site' || g || '.org'
                  WHEN 4 THEN 'site' || g || '.example'
                  WHEN 5 THEN 'localhost'
                  WHEN 6 THEN 'co.uk'
                  ELSE 'x.y.z.w.site' || g || '.co.uk' END AS host,
           CASE m WHEN 0 THEN 'site' || g || '.co.uk'
                  WHEN 1 THEN 'site' || g || '.com'
                  WHEN 2 THEN 'site' || g || '.gov.uk'
                  WHEN 3 THEN 'site' || g || '.org'
                  WHEN 4 THEN 'site' || g || '.example'
                  WHEN 5 THEN NULL
                  WHEN 6 THEN NULL
                  ELSE 'site' || g || '.co.uk' END AS reg_domain
         FROM h""",

    "url_normalize" -> Pages.sqlWith(
      // same regexp_replace chain as WebOps.normalizeUrl; every pattern
      // matches at most once so replace-all (Spark) == replace-first
      // (DuckDB), and all patterns are Java-regex/RE2 agnostic
      """SELECT doc_id, url,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             lower(url), '^[a-z][a-z0-9+.-]*://', ''), '#.*$', ''), '\?.*$', ''), '^www\.', ''), '/$', '') AS norm_url,
           regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url), '^[a-z][a-z0-9+.-]*://', ''), '#.*$', ''), '\?.*$', ''), '^www\.', ''), '/$', ''),
             '/.*$', ''), ':[0-9]+$', '') AS host
         FROM pages"""),

    "url_host_stats" -> Pages.sqlWith(
      """SELECT host, count(*) AS n_pages, count(DISTINCT lang) AS n_langs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                min(warc_sec) AS first_sec, max(warc_sec) AS last_sec
         FROM (SELECT regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   lower(url), '^[a-z][a-z0-9+.-]*://', ''), '#.*$', ''), '\?.*$', ''), '^www\.', ''), '/$', ''),
                 '/.*$', ''), ':[0-9]+$', '') AS host,
               lang, warc_sec, CAST(length(text) AS BIGINT) AS n_chars
               FROM pages)
         GROUP BY host"""),

    "url_dedup_latest" -> Pages.sqlWith(
      // keep-latest mirrored as row_number over the SAME total order the
      // engine's max-of-struct uses: warc_sec first, then every column
      // in table order, all DESC
      """SELECT norm_url, doc_id, url, warc_sec, lang, fetch_no FROM (
           SELECT *, row_number() OVER (PARTITION BY norm_url
             ORDER BY warc_sec DESC, doc_id DESC, url DESC, lang DESC, fetch_no DESC) AS rn
           FROM (SELECT *,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url), '^[a-z][a-z0-9+.-]*://', ''), '#.*$', ''), '\?.*$', ''), '^www\.', ''), '/$', '') AS norm_url
             FROM (
               SELECT doc_id, url, warc_sec, lang, 0 AS fetch_no FROM pages
               UNION ALL
               SELECT doc_id, url,
                 CASE WHEN doc_id % 6 = 0 THEN warc_sec - 1000
                      ELSE warc_sec + 86400 END, lang, 1
               FROM pages WHERE doc_id % 3 = 0)))
         WHERE rn = 1"""),

    "html_extract" -> Pages.sqlWith(
      """SELECT url,
           md5(regexp_replace(regexp_replace(
             '<!DOCTYPE html><html lang="' || lang || '"><head><title>' || url ||
             '</title><meta charset="utf-8"/></head><body><p id="main">' || text || '</p></body></html>',
             '<head>.*?</head>', ''), '<[^>]*>', '', 'g')) AS text_md5,
           regexp_replace(regexp_replace(
             '<!DOCTYPE html><html lang="' || lang || '"><head><title>' || url ||
             '</title><meta charset="utf-8"/></head><body><p id="main">' || text || '</p></body></html>',
             '<head>.*?</head>', ''), '<[^>]*>', '', 'g') = text AS ok
         FROM pages"""),

    "warc_revisit" ->
      // same (warc_sec, uri, doc_id)-ordered window per digest; DuckDB
      // md5 over the same payload string agrees byte-for-byte
      Pages.sqlWith("""
        , p AS (SELECT doc_id, url, warc_sec,
            'payload-' || CAST(doc_id % 120 AS VARCHAR) AS pay
          FROM pages),
        w AS (SELECT doc_id, url AS uri, warc_sec AS sec,
            md5(pay) AS digest, length(pay) AS plen,
            row_number() OVER (PARTITION BY md5(pay)
              ORDER BY warc_sec, url, doc_id) AS rn,
            first_value(url) OVER (PARTITION BY md5(pay)
              ORDER BY warc_sec, url, doc_id) AS orig_uri,
            first_value(warc_sec) OVER (PARTITION BY md5(pay)
              ORDER BY warc_sec, url, doc_id) AS orig_sec
          FROM p)
        SELECT doc_id, uri, sec, digest,
          CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS warc_type,
          CASE WHEN rn = 1 THEN '' ELSE orig_uri END AS refers_to_uri,
          CASE WHEN rn = 1 THEN 0 ELSE CAST(orig_sec AS BIGINT) END AS refers_to_sec,
          CASE WHEN rn = 1 THEN 0 ELSE CAST(plen AS BIGINT) END AS saved_bytes
        FROM w"""),

    "warc_roundtrip" -> Pages.sqlWith(
      // record byte length recomputed from first principles: 176 constant
      // header/trailer bytes + uri + Content-Length digits + payload
      """SELECT doc_id, url AS target_uri,
           strftime(make_timestamp(warc_sec * 1000000),
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           md5(text) AS payload_md5,
           CAST(176 + strlen(url)
                    + length(CAST(strlen(text) AS VARCHAR))
                    + strlen(text) AS BIGINT) AS rec_len,
           TRUE AS ok
         FROM pages"""),

    "warc_gz_roundtrip" -> Pages.sqlWith(
      """SELECT doc_id, url AS target_uri,
           strftime(make_timestamp(warc_sec * 1000000),
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           md5(text) AS payload_md5,
           CAST(176 + strlen(url)
                    + length(CAST(strlen(text) AS VARCHAR))
                    + strlen(text) AS BIGINT) AS rec_len,
           TRUE AS ok
         FROM pages"""),

    // identical recomputation: the container codec must be invisible
    "warc_zstd_roundtrip" -> Pages.sqlWith(
      """SELECT doc_id, url AS target_uri,
           strftime(make_timestamp(warc_sec * 1000000),
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           md5(text) AS payload_md5,
           CAST(176 + strlen(url)
                    + length(CAST(strlen(text) AS VARCHAR))
                    + strlen(text) AS BIGINT) AS rec_len,
           TRUE AS ok
         FROM pages"""),

    "warc_cdx_fetch" -> Pages.sqlWith(
      """SELECT doc_id, md5(text) AS payload_md5, TRUE AS fetch_ok
         FROM pages"""),

    "text_tfidf" -> (sqlToks +
      """, tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
                  FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         scored AS (SELECT t.doc_id, t.tok, t.tf, d.df,
             CAST(t.tf AS DOUBLE) *
               (ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE)) + 1.0) AS score
           FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n)
        SELECT doc_id, tok, tf, df, score FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, tok) AS rn FROM scored)
        WHERE rn <= 5"""),

    // BM25: the float constants reach SQL as CAST('…' AS DOUBLE) of the
    // Scala Doubles' round-trip toString, so k1, b, k1+1 are bit-identical
    // across engines; everything else is integer counts + the same
    // parenthesized IEEE expression (the text_tfidf ln precedent)
    "text_bm25" -> (sqlToks +
      s""", tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
                  FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         st AS (SELECT n_docs,
             CAST(total_toks AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
           FROM (SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n_docs,
                        (SELECT sum(tf) FROM tf) AS total_toks)),
         scored AS (SELECT t.doc_id, t.tok, t.tf, d.df, l.dl,
             ln(1.0 + (CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                      / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(t.tf AS DOUBLE) * ${sqlDouble(1.2 + 1.0)})
                / (CAST(t.tf AS DOUBLE) + ${sqlDouble(1.2)} *
                   (1.0 - ${sqlDouble(0.75)} + ${sqlDouble(0.75)} *
                    (CAST(l.dl AS DOUBLE) / s.avgdl)))) AS score
           FROM tf t JOIN dfreq d USING (tok) JOIN dl l USING (doc_id)
           CROSS JOIN st s)
        SELECT doc_id, tok, tf, df, dl, ROUND(score, 9) AS score FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, tok) AS rn FROM scored)
        WHERE rn <= 5"""),

    "bpe_encode" -> sqlBpeEncode,

    // --- pinned-constant oracles (VERDICT r4 #5): these queries run on
    // deterministic sf-independent fixtures, so their outputs are
    // constants; the VALUES tables below were generated ONCE from the
    // verified Spark output (tools/pin_oracle.py) and are now the
    // hash-exact contract. Each op additionally carries a differential
    // ScalaTest suite (ImageHashSpec/AudioHashSpec/VideoHashSpec/PqSpec/
    // BpeSpec/JpegSpec) proving the machinery, not just the fixture.
    "mm_phash_pairs" -> """SELECT * FROM (VALUES
      (0, 1, 2),
      (0, 3, 2),
      (0, 4, 0),
      (1, 2, 2),
      (1, 4, 2),
      (10, 11, 2),
      (10, 12, 0),
      (10, 13, 0),
      (10, 14, 2),
      (11, 12, 2),
      (11, 13, 2),
      (11, 14, 0),
      (12, 13, 0),
      (12, 14, 2),
      (13, 14, 2),
      (15, 16, 0),
      (15, 17, 0),
      (15, 18, 0),
      (15, 19, 0),
      (16, 17, 0),
      (16, 18, 0),
      (16, 19, 0),
      (17, 18, 0),
      (17, 19, 0),
      (18, 19, 0),
      (20, 21, 0),
      (20, 22, 0),
      (20, 23, 0),
      (20, 24, 0),
      (20, 30, 0),
      (20, 31, 0),
      (20, 32, 0),
      (20, 33, 0),
      (20, 34, 0),
      (21, 22, 0),
      (21, 23, 0),
      (21, 24, 0),
      (21, 30, 0),
      (21, 31, 0),
      (21, 32, 0),
      (21, 33, 0),
      (21, 34, 0),
      (22, 23, 0),
      (22, 24, 0),
      (22, 30, 0),
      (22, 31, 0),
      (22, 32, 0),
      (22, 33, 0),
      (22, 34, 0),
      (23, 24, 0),
      (23, 30, 0),
      (23, 31, 0),
      (23, 32, 0),
      (23, 33, 0),
      (23, 34, 0),
      (24, 30, 0),
      (24, 31, 0),
      (24, 32, 0),
      (24, 33, 0),
      (24, 34, 0),
      (25, 26, 0),
      (25, 27, 0),
      (25, 28, 0),
      (25, 29, 0),
      (26, 27, 0),
      (26, 28, 0),
      (26, 29, 0),
      (27, 28, 0),
      (27, 29, 0),
      (28, 29, 0),
      (3, 4, 2),
      (30, 31, 0),
      (30, 32, 0),
      (30, 33, 0),
      (30, 34, 0),
      (31, 32, 0),
      (31, 33, 0),
      (31, 34, 0),
      (32, 33, 0),
      (32, 34, 0),
      (33, 34, 0),
      (35, 36, 0),
      (35, 37, 0),
      (35, 38, 0),
      (35, 39, 0),
      (36, 37, 0),
      (36, 38, 0),
      (36, 39, 0),
      (37, 38, 0),
      (37, 39, 0),
      (38, 39, 0),
      (40, 44, 2),
      (43, 44, 2),
      (45, 46, 2),
      (45, 47, 2),
      (45, 49, 2),
      (47, 49, 2),
      (5, 6, 0),
      (5, 7, 0),
      (5, 8, 0),
      (5, 9, 0),
      (50, 51, 0),
      (50, 52, 0),
      (50, 53, 0),
      (50, 54, 0),
      (51, 52, 0),
      (51, 53, 0),
      (51, 54, 0),
      (52, 53, 0),
      (52, 54, 0),
      (53, 54, 0),
      (55, 56, 2),
      (55, 57, 0),
      (55, 58, 2),
      (56, 57, 2),
      (56, 58, 2),
      (56, 59, 2),
      (57, 58, 2),
      (58, 59, 2),
      (6, 7, 0),
      (6, 8, 0),
      (6, 9, 0),
      (7, 8, 0),
      (7, 9, 0),
      (8, 9, 0))
      AS t("doc_a", "doc_b", "dist")""",

    "mm_ahash_pairs" -> """SELECT * FROM (VALUES
      (0, 1, 0),
      (0, 2, 2),
      (1, 2, 2),
      (12, 13, 2),
      (13, 14, 2),
      (16, 17, 2),
      (18, 19, 2),
      (18, 20, 2),
      (19, 20, 2),
      (21, 22, 0),
      (21, 23, 2),
      (22, 23, 2),
      (3, 4, 0),
      (3, 5, 0),
      (4, 5, 0),
      (6, 7, 2),
      (6, 8, 2),
      (7, 8, 0),
      (9, 10, 2))
      AS t("doc_a", "doc_b", "dist")""",

    "mm_vhash_pairs" -> """SELECT * FROM (VALUES
      (10, 11, 2, 0),
      (12, 13, 3, 0),
      (12, 14, 3, 0),
      (12, 18, 2, 0),
      (12, 19, 2, 0),
      (12, 20, 2, 0),
      (13, 14, 3, 0),
      (13, 18, 2, 0),
      (13, 19, 2, 0),
      (13, 20, 2, 0),
      (14, 18, 2, 0),
      (14, 19, 2, 0),
      (14, 20, 2, 0),
      (15, 16, 3, 0),
      (15, 17, 3, 0),
      (16, 17, 3, 0),
      (18, 19, 3, 0),
      (18, 20, 3, 0),
      (19, 20, 3, 0),
      (21, 22, 3, 0),
      (21, 23, 3, 0),
      (22, 23, 3, 0),
      (25, 26, 2, 2),
      (3, 4, 3, 0),
      (3, 5, 3, 0),
      (4, 5, 3, 0),
      (6, 7, 3, 2),
      (6, 8, 2, 2),
      (7, 8, 2, 0),
      (9, 10, 2, 0),
      (9, 11, 2, 0))
      AS t("doc_a", "doc_b", "n_matched", "max_dist")""",

    "mm_phash_clusters" -> """SELECT * FROM (VALUES
      (0, 0),
      (1, 0),
      (10, 10),
      (100, 0),
      (101, 0),
      (102, 0),
      (103, 0),
      (104, 0),
      (105, 0),
      (106, 0),
      (107, 0),
      (108, 0),
      (109, 0),
      (11, 10),
      (110, 0),
      (111, 0),
      (112, 0),
      (113, 0),
      (114, 0),
      (115, 0),
      (116, 0),
      (117, 0),
      (118, 0),
      (119, 0),
      (12, 10),
      (13, 10),
      (14, 10),
      (15, 15),
      (16, 15),
      (17, 15),
      (18, 15),
      (19, 15),
      (2, 0),
      (20, 20),
      (21, 20),
      (22, 20),
      (23, 20),
      (24, 20),
      (25, 25),
      (26, 25),
      (27, 25),
      (28, 25),
      (29, 25),
      (3, 0),
      (30, 20),
      (31, 20),
      (32, 20),
      (33, 20),
      (34, 20),
      (35, 35),
      (36, 35),
      (37, 35),
      (38, 35),
      (39, 35),
      (4, 0),
      (40, 40),
      (41, 41),
      (42, 42),
      (43, 40),
      (44, 40),
      (45, 45),
      (46, 45),
      (47, 45),
      (48, 48),
      (49, 45),
      (5, 5),
      (50, 50),
      (51, 50),
      (52, 50),
      (53, 50),
      (54, 50),
      (55, 55),
      (56, 55),
      (57, 55),
      (58, 55),
      (59, 55),
      (6, 5),
      (7, 5),
      (8, 5),
      (9, 5))
      AS t("doc_id", "cluster")""",

    "ann_pq" -> """SELECT * FROM (VALUES
      (0, 25, 612000000.0, 1),
      (0, 34, 612000000.0, 2),
      (0, 59, 612000000.0, 3),
      (1, 17, 650400000.0, 2),
      (1, 42, 650400000.0, 3),
      (1, 8, 650400000.0, 1),
      (2, 27, 646600000.0, 1),
      (2, 36, 646600000.0, 2),
      (2, 61, 646600000.0, 3),
      (3, 10, 588000000.0, 1),
      (3, 19, 588000000.0, 2),
      (3, 44, 588000000.0, 3),
      (4, 29, 672500000.0, 1),
      (4, 38, 672500000.0, 2),
      (4, 63, 672500000.0, 3),
      (5, 0, 540000000.0, 1),
      (5, 3, 540000000.0, 2),
      (5, 7, 540000000.0, 3),
      (6, 31, 680320000.0, 1),
      (6, 40, 680320000.0, 2),
      (6, 49, 680320000.0, 3),
      (7, 0, 588000000.0, 1),
      (7, 25, 588000000.0, 2),
      (7, 34, 588000000.0, 3))
      AS t("query_id", "neighbor_id", "adc_score", "rank")""",

    "geo_s2_kring" -> """SELECT * FROM (VALUES
      (-6485183463413510145, 8, 8),
      (-6485183463413510208, 9, 9),
      (-6485183463413511168, 9, 36),
      (-6485183463413511510, 8, 8),
      (-6485183463413511531, 9, 9),
      (-6485183463413511851, 9, 18),
      (-6485183463413512534, 9, 27),
      (-6485183463413512854, 9, 9),
      (-6485183463413512875, 8, 8),
      (-6485183463413513216, 9, 9),
      (-6485183463413513217, 9, 9),
      (-6485183463413514177, 9, 9),
      (-6485183463413514240, 8, 8),
      (-8791026472627204779, 9, 9),
      (-8791026472627205120, 9, 18),
      (-8791026472627206144, 9, 9),
      (-8791026472627207168, 9, 18),
      (2738188573441262592, 9, 9),
      (2738188573441263274, 9, 9),
      (2738188573441263615, 9, 9),
      (2738188573441264640, 9, 9),
      (2738188573441264981, 9, 9),
      (2738188573441265322, 9, 9),
      (432345564227568298, 9, 9),
      (432345564227568640, 9, 9),
      (432345564227569322, 9, 9),
      (432345564227569663, 9, 9),
      (432345564227569664, 9, 9),
      (432345564227570688, 9, 9),
      (432345564227571029, 9, 9),
      (432345564227571370, 9, 9),
      (5044031582654955520, 8, 8),
      (5044031582654955583, 9, 9),
      (5044031582654956543, 9, 9),
      (5044031582654956885, 8, 8),
      (5044031582654956906, 9, 9),
      (5044031582654957226, 9, 27),
      (5044031582654957567, 9, 9),
      (5044031582654957909, 9, 18),
      (5044031582654958229, 9, 9),
      (5044031582654958250, 8, 8),
      (5044031582654958592, 9, 36),
      (5044031582654959552, 9, 9),
      (5044031582654959615, 8, 8),
      (7349874591868651178, 9, 27),
      (7349874591868651520, 9, 9),
      (7349874591868652544, 9, 18),
      (7349874591868652885, 9, 9))
      AS t("s2", "ring_size", "n_rows")""",
"raster_coregister" -> """SELECT * FROM (VALUES
      (0, 0, '1.6819891352367353'::DOUBLE, '0.894292179063932'::DOUBLE, 1024),
      (0, 1, '1.6682961764375852'::DOUBLE, '1.17652974277464'::DOUBLE, 1024),
      (0, 2, '1.782508095908976'::DOUBLE, '0.7917383293474926'::DOUBLE, 1024),
      (0, 3, '1.781636930276588'::DOUBLE, '1.061376605932304'::DOUBLE, 1024),
      (1, 0, '2.0012929022878416'::DOUBLE, '0.8110071569892694'::DOUBLE, 1024),
      (1, 1, '1.9999999877484602'::DOUBLE, '0.999999958559968'::DOUBLE, 1024),
      (1, 2, '1.9999999944385645'::DOUBLE, '0.9999999853478184'::DOUBLE, 1024),
      (1, 3, '2.001996140915979'::DOUBLE, '0.7929233577223114'::DOUBLE, 1024),
      (2, 0, '2.0180021601730056'::DOUBLE, '0.8373552148074132'::DOUBLE, 1024),
      (2, 1, '1.9999999877311059'::DOUBLE, '1.000000043960337'::DOUBLE, 1024),
      (2, 2, '1.99999999329996'::DOUBLE, '0.9999999957567134'::DOUBLE, 1024),
      (2, 3, '2.0761237549983487'::DOUBLE, '0.796860338669704'::DOUBLE, 1024),
      (3, 0, '1.5163060563985764'::DOUBLE, '1.0236545749667163'::DOUBLE, 1024),
      (3, 1, '1.483709286698618'::DOUBLE, '1.5033968259022845'::DOUBLE, 1024),
      (3, 2, '1.473625452638152'::DOUBLE, '0.8803958860809474'::DOUBLE, 1024),
      (3, 3, '1.4405542743607835'::DOUBLE, '1.0591911536233407'::DOUBLE, 1024))
      AS t("tile_x", "tile_y", "mean_u", "mean_v", "n_px")""",

    "raster_reproject" -> """SELECT * FROM (VALUES
      (0, 0, 0, 0.0, 96.0, 173033, 3600),
      (0, 1, 0, 0.0, 96.0, 173314, 3600),
      (0, 2, 0, 0.0, 96.0, 172340, 3600),
      (0, 3, 0, 0.0, 96.0, 172953, 3600),
      (1, 0, 0, 0.0, 96.0, 173453, 3600),
      (1, 1, 0, 0.0, 96.0, 172570, 3600),
      (1, 2, 0, 0.0, 96.0, 172954, 3600),
      (1, 3, 0, 0.0, 96.0, 172888, 3600),
      (2, 0, 0, 0.0, 96.0, 173614, 3600),
      (2, 1, 0, 0.0, 96.0, 172440, 3600),
      (2, 2, 0, 0.0, 96.0, 173406, 3600),
      (2, 3, 0, 0.0, 96.0, 172661, 3600),
      (3, 0, 0, 0.0, 96.0, 164504, 3420),
      (3, 1, 0, 0.0, 96.0, 164640, 3420),
      (3, 2, 0, 0.0, 96.0, 163802, 3420),
      (3, 3, 0, 0.0, 96.0, 164331, 3420))
      AS t("cell_x", "cell_y", "band", "vmin", "vmax", "vsum", "n_px")""",

    "bpe_train" -> """SELECT * FROM (VALUES
      (0, 'h', 'e', 1416, 'he'),
      (1, 't', 'he', 1416, 'the'),
      (10, 'n', '</w>', 457, 'n</w>'),
      (11, 'the', 'n</w>', 457, 'then</w>'),
      (12, 'ingest', '</w>', 431, 'ingest</w>'),
      (13, 'the', '</w>', 313, 'the</w>'),
      (14, 'r', 'est', 306, 'rest'),
      (15, 'ing', '</w>', 278, 'ing</w>'),
      (2, 'e', 's', 974, 'es'),
      (3, 'es', 't', 974, 'est'),
      (4, 'i', 'n', 946, 'in'),
      (5, 'in', 'g', 946, 'ing'),
      (6, 'ing', 'est', 668, 'ingest'),
      (7, 'e', '</w>', 646, 'e</w>'),
      (8, 'r', 'e</w>', 646, 're</w>'),
      (9, 'the', 're</w>', 646, 'there</w>'))
      AS t("rank", "left", "right", "pair_count", "symbol")""",

    "mm_jpeg_decode" -> """SELECT * FROM (VALUES
      (0, 48, 32, 3, 170248, 120280, 271948, 0),
      (1, 48, 32, 3, 171428, 123796, 274700, 0),
      (10, 48, 32, 3, 186112, 151072, 317836, 0),
      (11, 48, 32, 3, 187132, 154368, 320972, 0),
      (12, 48, 32, 3, 189152, 156996, 326840, 0),
      (13, 48, 32, 3, 190420, 160632, 330236, 0),
      (14, 48, 32, 3, 192216, 163600, 335728, 0),
      (15, 48, 32, 3, 193732, 166488, 340952, 0),
      (16, 48, 32, 3, 195304, 169712, 344216, 0),
      (17, 48, 32, 3, 196768, 172404, 349964, 0),
      (18, 48, 32, 3, 198436, 175836, 353352, 0),
      (19, 48, 32, 3, 199559, 179291, 341876, 0),
      (2, 48, 32, 3, 173624, 126564, 280668, 0),
      (20, 48, 32, 3, 201136, 182076, 323407, 0),
      (21, 48, 32, 3, 202584, 185292, 301805, 0),
      (22, 48, 32, 3, 203584, 188304, 282164, 0),
      (23, 48, 32, 3, 205177, 191409, 262941, 0),
      (24, 48, 32, 3, 207100, 194656, 242384, 0),
      (25, 48, 32, 3, 209480, 197164, 222863, 0),
      (26, 48, 32, 3, 210049, 200797, 201909, 0),
      (27, 48, 32, 3, 212333, 202905, 182731, 0),
      (28, 48, 32, 3, 213288, 206712, 162654, 0),
      (29, 48, 32, 3, 215468, 209720, 142541, 0),
      (3, 48, 32, 3, 174888, 130072, 284568, 0),
      (30, 48, 32, 3, 216700, 213016, 122877, 0),
      (31, 48, 32, 3, 218527, 215819, 102256, 0),
      (32, 48, 32, 3, 219599, 218683, 82851, 0),
      (33, 48, 32, 3, 221164, 221800, 62601, 0),
      (34, 48, 32, 3, 222471, 225167, 42491, 0),
      (35, 48, 32, 3, 224128, 228224, 40224, 0),
      (36, 48, 32, 3, 225992, 231312, 42912, 0),
      (37, 48, 32, 3, 227108, 234212, 48648, 0),
      (38, 48, 32, 3, 229112, 237136, 52428, 0),
      (39, 48, 32, 3, 230376, 240452, 57368, 0),
      (4, 48, 32, 3, 176800, 132852, 289388, 0),
      (40, 48, 32, 3, 232416, 243272, 62796, 0),
      (41, 48, 32, 3, 233572, 246816, 66116, 0),
      (42, 48, 32, 3, 235040, 249560, 71880, 0),
      (43, 48, 32, 3, 236520, 252736, 75080, 0),
      (44, 48, 32, 3, 238096, 255692, 80436, 0),
      (45, 48, 32, 3, 239792, 258784, 85944, 0),
      (46, 48, 32, 3, 241448, 262200, 89320, 0),
      (47, 48, 32, 3, 242876, 264852, 94992, 0),
      (48, 48, 32, 3, 244344, 268052, 98184, 0),
      (49, 48, 32, 3, 245972, 270960, 103560, 0),
      (5, 48, 32, 3, 177828, 135800, 295116, 0),
      (6, 48, 32, 3, 179768, 138956, 297868, 0),
      (7, 48, 32, 3, 180968, 142004, 303764, 0),
      (8, 48, 32, 3, 183020, 145112, 307648, 0),
      (9, 48, 32, 3, 184176, 148360, 312512, 0))
      AS t("doc_id", "width", "height", "channels", "ch0_sum", "ch1_sum", "ch2_sum", "ch3_sum")""",

    "text_curate" ->
      // composite of three proven mirrors: gopher pass ∧ dup_tok_frac
      // below threshold ∧ exact-dup canonical
      """WITH g AS (SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS sum_len,
           CAST(len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS n_stop,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
           CAST(length(text) AS BIGINT) AS n_chars
         FROM documents),
        gp AS (SELECT doc_id, n_tokens FROM g
          WHERE n_tokens >= 20 AND n_tokens <= 100000
            AND CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 3.0
            AND CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 10.0
            AND n_stop >= 2
            AND CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) >= 0.7),
        occ AS (SELECT doc_id, tok FROM
          (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE tok <> ''),
        tokcnt AS (SELECT doc_id, tok, count(*) AS cnt FROM occ GROUP BY 1, 2),
        rep AS (SELECT doc_id,
            CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_tok_frac
          FROM tokcnt GROUP BY doc_id),
        canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        SELECT gp.doc_id, gp.n_tokens, rep.dup_tok_frac
        FROM gp JOIN rep USING (doc_id) JOIN canon USING (doc_id)
        WHERE rep.dup_tok_frac < 0.6""",

    "text_decontaminate" ->
      // 6-gram shingles rebuilt by ranked self-joins (the
      // dedup_minhash_shingles recipe); benchmark grams = distinct grams
      // of the doc_id % 41 subset; any-hit flag per doc
      """WITH occ AS (
           SELECT doc_id,
                  row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
                  tok
           FROM (SELECT doc_id,
                        unnest(string_split(text, ' ')) AS tok,
                        generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents)
           WHERE tok <> ''),
         grams AS (SELECT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok || ' ' ||
             d.tok || ' ' || e.tok || ' ' || f.tok AS tok
           FROM occ a
           JOIN occ b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
           JOIN occ c ON c.doc_id = a.doc_id AND c.rn = a.rn + 2
           JOIN occ d ON d.doc_id = a.doc_id AND d.rn = a.rn + 3
           JOIN occ e ON e.doc_id = a.doc_id AND e.rn = a.rn + 4
           JOIN occ f ON f.doc_id = a.doc_id AND f.rn = a.rn + 5),
         bench AS (SELECT DISTINCT tok FROM grams WHERE doc_id % 41 = 0),
         hits AS (SELECT g.doc_id, count(*) AS n_hit
                  FROM grams g JOIN bench USING (tok) GROUP BY g.doc_id),
         base AS (SELECT doc_id,
             CAST(greatest(len(list_filter(string_split(text, ' '),
               x -> x <> '')) - 5, 0) AS BIGINT) AS n_grams
           FROM documents)
         SELECT base.doc_id, base.n_grams,
                CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
                coalesce(h.n_hit, 0) > 0 AS contaminated
         FROM base LEFT JOIN hits h ON h.doc_id = base.doc_id""",

    "text_classifier" -> (sqlToks +
      // md5prefix bucket in [0,1024), fixed multiplicative weight table
      // in [-1000,1000], integer mean over token occurrences
      """, w AS (SELECT doc_id,
             (CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 1024) AS b
           FROM toks),
         s AS (SELECT doc_id,
             CAST(sum((b * 2654435761) % 2001 - 1000) AS BIGINT) AS score_int,
             count(*) AS n_tokens
           FROM w GROUP BY doc_id)
         SELECT doc_id, score_int, n_tokens,
           CAST(score_int AS DOUBLE) / CAST(n_tokens * 1000 AS DOUBLE) AS score,
           score_int > 0 AS label
         FROM s"""),

    "text_charlm" ->
      // char-bigram LM with add-one smoothing, trained on doc_id % 5 = 0;
      // per-bigram log-likelihoods snapped to integer micro-nats so the
      // per-doc sum is order-independent in both engines
      """WITH bg AS (SELECT doc_id,
             unnest([substr(text, CAST(x AS INTEGER), 2)
                     for x in range(1, len(text))]) AS bg
           FROM documents WHERE len(text) >= 2),
         model AS (SELECT bg, count(*) AS cnt FROM bg
                   WHERE doc_id % 5 = 0 GROUP BY bg),
         ctx AS (SELECT substr(bg, 1, 1) AS c, CAST(sum(cnt) AS BIGINT) AS ctx
                 FROM model GROUP BY 1),
         vsize AS (SELECT count(DISTINCT c) AS v FROM
           (SELECT unnest([substr(text, CAST(x AS INTEGER), 1)
                           for x in range(1, len(text) + 1)]) AS c
            FROM documents WHERE doc_id % 5 = 0)),
         scored AS (SELECT b.doc_id,
             CAST(round(ln(CAST(coalesce(m.cnt, 0) + 1 AS DOUBLE) /
               CAST(coalesce(x.ctx, 0) + v.v AS DOUBLE)) * 1000000, 0)
               AS BIGINT) AS ll
           FROM bg b
           LEFT JOIN model m ON m.bg = b.bg
           LEFT JOIN ctx x ON x.c = substr(b.bg, 1, 1)
           CROSS JOIN vsize v)
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(ll) AS BIGINT) AS ll_micro,
                CAST(-sum(ll) AS DOUBLE) /
                  CAST(count(*) * 1000000 AS DOUBLE) AS avg_nll
         FROM scored GROUP BY doc_id""",

    "text_dsir" ->
      // hashed word-bigram features; Laplace-smoothed target (lang=en)
      // vs corpus profiles; per-bucket log-ratios in integer micro-nats
      """WITH occ AS (
           SELECT doc_id,
                  row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
                  tok
           FROM (SELECT doc_id,
                        unnest(string_split(text, ' ')) AS tok,
                        generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents)
           WHERE tok <> ''),
         grams AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS g
           FROM occ a JOIN occ b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1),
         feats AS (SELECT doc_id,
             (CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 4096) AS b
           FROM grams),
         tgt AS (SELECT b, count(*) AS cnt_t FROM feats
                 JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
         src AS (SELECT b, count(*) AS cnt_s FROM feats GROUP BY b),
         tot AS (SELECT
             CAST(sum(CASE WHEN lang = 'en' THEN
               greatest(len(list_filter(string_split(text, ' '),
                 x -> x <> '')) - 1, 0) ELSE 0 END) AS BIGINT) AS tot_t,
             CAST(sum(greatest(len(list_filter(string_split(text, ' '),
               x -> x <> '')) - 1, 0)) AS BIGINT) AS tot_s
           FROM documents),
         scored AS (SELECT f.doc_id,
             CAST(round((ln(CAST(coalesce(t.cnt_t, 0) + 1 AS DOUBLE) /
                            CAST(tot.tot_t + 4096 AS DOUBLE))
                       - ln(CAST(coalesce(s.cnt_s, 0) + 1 AS DOUBLE) /
                            CAST(tot.tot_s + 4096 AS DOUBLE))) * 1000000, 0)
               AS BIGINT) AS lr
           FROM feats f LEFT JOIN tgt t USING (b) LEFT JOIN src s USING (b)
           CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_feats,
                CAST(sum(lr) AS BIGINT) AS logw_micro,
                CAST(sum(lr) AS DOUBLE) /
                  CAST(count(*) * 1000000 AS DOUBLE) AS avg_logw,
                sum(lr) > 0 AS target_like
         FROM scored GROUP BY doc_id""",

    "url_host_cap" -> Pages.sqlWith(
      // one-window semantics; the engine's salted pre-prune is
      // result-invariant by the top-n-of-subgroup-top-n argument
      """SELECT host, doc_id, url, pick_rank FROM (
           SELECT host, doc_id, url,
             row_number() OVER (PARTITION BY host ORDER BY pick, url) AS pick_rank
           FROM (SELECT doc_id, url,
             regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 lower(url), '^[a-z][a-z0-9+.-]*://', ''), '#.*$', ''), '\?.*$', ''), '^www\.', ''), '/$', ''),
               '/.*$', ''), ':[0-9]+$', '') AS host,
             md5(url) AS pick
             FROM pages))
         WHERE pick_rank <= 3"""),

    "url_blocklist" -> Pages.sqlWith(
      """SELECT host, doc_id, url FROM (
           SELECT doc_id, url,
             regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 lower(url), '^[a-z][a-z0-9+.-]*://', ''), '#.*$', ''), '\?.*$', ''), '^www\.', ''), '/$', ''),
               '/.*$', ''), ':[0-9]+$', '') AS host
           FROM pages)
         WHERE host NOT IN ('host0.example', 'host13.example', 'host51.example')"""),

    // pinned-constant oracle (pin_oracle.py flow): fixture input,
    // pure per-row recursion, verified bit-identical at local[7/32]
    // integer vertices -> exact dx/dy and exact integer lengths; azimuth
    // is the one libm call, absorbed by ROUND-9 on both engines
    "vector_segments" -> (s"WITH $sqlLinePts" +
      """ SELECT fid, CAST(seg AS INTEGER) AS seg, len,
          ROUND(degrees(atan2(dx, dy)), 9) AS az FROM sg"""),
    // expression-for-expression mirror of LineOps.densify at maxLen 4;
    // the last segment (seg = 5 on the 7-point fixture) also emits its
    // terminal vertex (i = n)
    // dyadic ¾/¼ cuts on integer vertices: plain arithmetic, exact on
    // both engines; endpoints kept, keys order the emission
    "vector_smooth" -> {
      def iter(t: Int): String =
        s""",
          s$t AS (SELECT fid, seq, x, y,
              lead(x) OVER w AS x1, lead(y) OVER w AS y1
            FROM c${t - 1} WINDOW w AS (PARTITION BY fid ORDER BY seq)),
          p$t AS (
            SELECT fid, CAST(-1 AS BIGINT) AS k, x, y FROM c${t - 1} WHERE seq = 0
            UNION ALL SELECT fid, CAST(2*seq AS BIGINT),
              0.75*x + 0.25*x1, 0.75*y + 0.25*y1 FROM s$t WHERE x1 IS NOT NULL
            UNION ALL SELECT fid, CAST(2*seq + 1 AS BIGINT),
              0.25*x + 0.75*x1, 0.25*y + 0.75*y1 FROM s$t WHERE x1 IS NOT NULL
            UNION ALL SELECT fid, CAST(2*seq AS BIGINT), x, y FROM s$t WHERE x1 IS NULL),
          c$t AS (SELECT fid,
              row_number() OVER (PARTITION BY fid ORDER BY k) - 1 AS seq, x, y
            FROM p$t)"""
      s"WITH $sqlLinePts, c0 AS (SELECT fid, seq, x, y FROM pts)" +
        (1 to 2).map(iter).mkString +
        "\n        SELECT fid, CAST(seq AS INTEGER) AS seq, x, y FROM c2"
    },
    "vector_densify" -> (s"WITH $sqlLinePts," +
      """ dn AS (SELECT fid, seg, x, y, dx, dy,
            GREATEST(CAST(CEIL(len / 4.0) AS INTEGER), 1) AS n FROM sg),
        gen AS (SELECT fid, seg, x, y, dx, dy, n,
            unnest(generate_series(0, CASE WHEN seg = 5 THEN n ELSE n - 1 END)) AS i
          FROM dn)
        SELECT fid, CAST(seg AS INTEGER) AS seg, CAST(i AS INTEGER) AS i,
          x + (CAST(i AS DOUBLE) / CAST(n AS DOUBLE)) * dx AS px,
          y + (CAST(i AS DOUBLE) / CAST(n AS DOUBLE)) * dy AS py
        FROM gen"""),
    // prefix sums of exact-integer lengths are order-independent, so the
    // winning segment predicate (cum <= f*total < cum+len) and the single
    // IEEE divide/multiply/add agree bitwise across engines
    "vector_line_interp" -> (s"WITH $sqlLinePts," +
      """ cums AS (SELECT *,
            SUM(len) OVER (PARTITION BY fid ORDER BY seg
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len AS cum,
            SUM(len) OVER (PARTITION BY fid) AS total FROM sg),
        fr(frac) AS (VALUES (0.25), (0.5), (0.75))
        SELECT fid, CAST(frac AS DOUBLE) AS frac,
          x + ((CAST(frac AS DOUBLE) * total - cum) / len) * dx AS px,
          y + ((CAST(frac AS DOUBLE) * total - cum) / len) * dy AS py
        FROM cums CROSS JOIN fr
        WHERE cum <= CAST(frac AS DOUBLE) * total
          AND CAST(frac AS DOUBLE) * total < cum + len"""),
    // dyadic half-life weights: integer shifts summed as BIGINT — the
    // exactness-by-construction alternative to the order-sensitive
    // exp(-λΔt) float fold
    "events_decay" ->
      """WITH m AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
        e AS (SELECT user_id,
            LEAST((m.max_us - epoch_us(ts)) // 3600000000, 30) AS k
          FROM events, m)
        SELECT user_id,
          CAST(sum(CAST(1 AS BIGINT) << CAST(30 - k AS INTEGER)) AS BIGINT) AS decay_units,
          CAST(count(*) AS BIGINT) AS n_events
        FROM e GROUP BY user_id""",
    // pinned constants (pin_oracle.py flow): zlib deflate output is an
    // environment pin (mm_jpeg_decode class); bit-stable local[2] vs [8]
    "text_comp_ratio" -> """SELECT * FROM (VALUES
      (0, 63, 57, 904761),
      (1, 400, 9, 22500),
      (2, 400, 33, 82500),
      (3, 1, 3, 3000000),
      (4, 419, 32, 76372),
      (5, 256, 63, 246093))
      AS t("doc_id", "raw_len", "comp_len", "ratio_ppm")""",
    "mm_snappy_roundtrip" -> """SELECT * FROM (VALUES
      (0, 63, 60, 952380, TRUE, 'the quick brown '),
      (1, 600, 35, 58333, TRUE, 'abababababababab'),
      (2, 500, 505, 1010000, TRUE, 'ueacftcsdbhvqmdk'),
      (3, 5000, 240, 48000, TRUE, 'xxxxxxxxxxxxxxxx'),
      (4, 559, 60, 107334, TRUE, 'token0 token1 to'),
      (5, 2889, 607, 210107, TRUE, '<div class="row"'),
      (6, 1, 3, 3000000, TRUE, 'z'),
      (7, 512, 89, 173828, TRUE, 'Lorem ipsum dolo'))
      AS t("doc_id", "raw_len", "comp_len", "ratio_ppm", "ok", "head")""",
    "mm_zstd_roundtrip" -> """SELECT * FROM (VALUES
      (0, 63, 79, 1253968, TRUE, 'the quick brown '),
      (1, 600, 616, 1026666, TRUE, 'abababababababab'),
      (2, 500, 516, 1032000, TRUE, 'ueacftcsdbhvqmdk'),
      (3, 5000, 17, 3400, TRUE, 'xxxxxxxxxxxxxxxx'),
      (4, 559, 575, 1028622, TRUE, 'token0 token1 to'),
      (5, 2889, 2905, 1005538, TRUE, '<div class="row"'),
      (6, 1, 17, 17000000, TRUE, 'z'),
      (7, 512, 528, 1031250, TRUE, 'Lorem ipsum dolo'))
      AS t("doc_id", "raw_len", "comp_len", "ratio_ppm", "ok", "head")""",
    "mm_lz4_roundtrip" -> """SELECT * FROM (VALUES
      (0, 63, 61, 968253, TRUE, 'the quick brown '),
      (1, 600, 14, 23333, TRUE, 'abababababababab'),
      (2, 500, 503, 1006000, TRUE, 'ueacftcsdbhvqmdk'),
      (3, 5000, 30, 6000, TRUE, 'xxxxxxxxxxxxxxxx'),
      (4, 559, 45, 80500, TRUE, 'token0 token1 to'),
      (5, 2889, 587, 203184, TRUE, '<div class="row"'),
      (6, 1, 2, 2000000, TRUE, 'z'),
      (7, 512, 76, 148437, TRUE, 'Lorem ipsum dolo'))
      AS t("doc_id", "raw_len", "comp_len", "ratio_ppm", "ok", "head")""",
    // occurrence-level signed bucket counts, md5prefix mirror
    "text_hashing" -> (sqlToks +
      """ SELECT doc_id, CAST(j AS BIGINT) AS j, CAST(SUM(sgn) AS BIGINT) AS val
        FROM (SELECT doc_id,
            CAST('0x' || substr(md5('0:' || tok), 1, 15) AS BIGINT) % 16 AS j,
            (CAST('0x' || substr(md5('1:' || tok), 1, 15) AS BIGINT) % 2) * 2 - 1 AS sgn
          FROM toks)
        GROUP BY doc_id, j HAVING SUM(sgn) <> 0"""),
    "events_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
        g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
                 OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        sid AS (SELECT *, SUM(new_sess) OVER
            (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM g),
        st AS (SELECT *, row_number() OVER
            (PARTITION BY user_id, sess_id ORDER BY us, event_id) AS step
          FROM sid),
        paths AS (SELECT user_id, sess_id,
            string_agg(event_type, '>' ORDER BY step) AS path
          FROM st WHERE step <= 5 GROUP BY user_id, sess_id)
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 20""",
    "events_wau" ->
      """WITH d AS (SELECT DISTINCT user_id,
            CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day FROM events),
        mx AS (SELECT max(day) AS max_day FROM d),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY 1),
        f AS (SELECT DISTINCT user_id, day + o.o AS day
          FROM d, range(7) o(o)),
        wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau FROM f GROUP BY 1)
        SELECT w.day, COALESCE(dau.dau, 0) AS dau, w.wau
        FROM wau w LEFT JOIN dau USING (day), mx
        WHERE w.day <= mx.max_day""",
    "raster_crosstab" ->
      """SELECT CAST((x // 16 + y // 16) % 4 AS DOUBLE) AS klass,
          CAST((x*7 + y*13) % 97 AS DOUBLE) AS v,
          CAST(count(*) AS BIGINT) AS n_px
        FROM range(96) r1(x), range(96) r2(y)
        GROUP BY 1, 2""",
    "tpch_q18" ->
      """WITH t AS (SELECT l_orderkey,
            CAST(sum(l_quantity) AS BIGINT) AS total_qty,
            CAST(count(*) AS BIGINT) AS n_items
          FROM lineitem GROUP BY 1 HAVING CAST(sum(l_quantity) AS BIGINT) > 120)
        SELECT t.l_orderkey AS orderkey, c.c_custkey, c.c_name,
          t.total_qty, t.n_items
        FROM t JOIN orders o ON t.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY total_qty DESC, orderkey LIMIT 50""",
    // hop lengths in whole meters (the geo_haversine trig recipe) so the
    // per-user totals are exact BIGINT sums
    "events_trajectory" ->
      """WITH p AS (SELECT user_id, ts, event_id AS seq,
            CAST((event_id * 29) % 720 AS DOUBLE) / 2.0 - 180.0 AS lon,
            CAST((event_id * 37) % 320 AS DOUBLE) / 2.0 - 80.0 AS lat
          FROM events),
        h AS (SELECT user_id, lon, lat,
            lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
          FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, seq)),
        d AS (SELECT user_id,
            CAST(ROUND(2.0 * 6378137.0 * asin(LEAST(1.0, sqrt(
              pow(sin(radians(lat - plat) / 2.0), 2)
              + cos(radians(plat)) * cos(radians(lat))
                * pow(sin(radians(lon - plon) / 2.0), 2)))), 0) AS BIGINT) AS hop_m
          FROM h WHERE plon IS NOT NULL)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_hops,
          CAST(sum(hop_m) AS BIGINT) AS dist_m, max(hop_m) AS max_hop_m
        FROM d GROUP BY 1""",
    // JL sketch mirror: same quantization + Knuth sign mix as the ann_lsh
    // oracle (division by 65536 = 2^16 exact, so bit draws match bitwise)
    "emb_rp" ->
      """WITH q AS (SELECT vec_id, d,
           CAST(ROUND(CAST(embedding[d + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS qv
         FROM embeddings, range(64) t(d))
        SELECT vec_id, CAST(j AS INTEGER) AS j,
          CAST(SUM(CASE WHEN CAST(FLOOR((d * 2654435761 + j * 40503 + 11) / 65536.0) AS BIGINT) % 2 = 0
                        THEN qv ELSE -qv END) AS BIGINT) AS pv
        FROM q, range(8) jj(j) GROUP BY vec_id, j""",
    "select_kcenters" -> kCentersOracle(5),
    "emb_kmeans" -> kMeansOracle(4, 3),
    // brute-force ε-pairs + recursive min-label closure over core-core
    // edges; border points take the LOWEST neighboring core's cluster
    // (the engine's pinned contract)
    "geo_dbscan" ->
      s"""WITH RECURSIVE pages AS (${Pages.sqlPages}),
        prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM pages a JOIN pages b
            ON a.doc_id < b.doc_id
           AND (a.lon_udeg - b.lon_udeg) * (a.lon_udeg - b.lon_udeg)
             + (a.lat_udeg - b.lat_udeg) * (a.lat_udeg - b.lat_udeg)
             <= 4000000000000),
        deg AS (SELECT id, count(*) AS n FROM (
            SELECT id_a AS id FROM prs UNION ALL SELECT id_b FROM prs)
          GROUP BY id),
        core AS (SELECT id FROM deg WHERE n + 1 >= 4),
        ce AS (SELECT DISTINCT u, v FROM (
            SELECT p.id_a AS u, p.id_b AS v FROM prs p
              JOIN core ca ON ca.id = p.id_a JOIN core cb ON cb.id = p.id_b
            UNION ALL
            SELECT p.id_b, p.id_a FROM prs p
              JOIN core ca ON ca.id = p.id_a JOIN core cb ON cb.id = p.id_b)),
        reach(src, dst) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM ce)
            UNION
            SELECT r.src, e.v FROM reach r JOIN ce e ON e.u = r.dst),
        comp AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src),
        corelab AS (SELECT c.id, COALESCE(m.cluster, c.id) AS cluster
          FROM core c LEFT JOIN comp m USING (id)),
        cand AS (SELECT id_a AS p, id_b AS c FROM prs
          UNION ALL SELECT id_b, id_a FROM prs)
        SELECT id, cluster, 'core' AS role FROM corelab
        UNION ALL
        SELECT cand.p AS id, MIN(cl.cluster) AS cluster, 'border' AS role
        FROM cand JOIN corelab cl ON cl.id = cand.c
        WHERE cand.p NOT IN (SELECT id FROM core) GROUP BY cand.p""",
    "raster_reclass" -> (sqlPx +
      """ SELECT x, y, band,
          CASE WHEN v < 20.0 THEN 1.0 WHEN v < 40.0 THEN 2.0
               WHEN v < 60.0 THEN 3.0 WHEN v < 80.0 THEN 4.0
               ELSE 5.0 END AS v
        FROM px"""),
    // Brovey: v·pan exact integer product; mean = (v0+v1)/2 exact; the one
    // double division mirrors op-for-op
    "raster_pansharpen" -> (sqlPx +
      """ SELECT x, y, band,
          CASE WHEN (b0 + b1) / 2.0 = 0.0 THEN 0.0
               ELSE v * pan / ((b0 + b1) / 2.0) END AS v
        FROM (SELECT x, y, band, v,
            CAST((x*11 + y*3) % 97 AS DOUBLE) AS pan,
            sum(CASE WHEN band = 0 THEN v END) OVER (PARTITION BY x, y) AS b0,
            sum(CASE WHEN band = 1 THEN v END) OVER (PARTITION BY x, y) AS b1
          FROM px)"""),
    // closed-form rect overlap on the unit grid; quarter-aligned coords
    // keep every product an exact binary fraction, so the clip+shoelace
    // engine path must match bitwise
    "geo_coverage" ->
      """WITH f AS (SELECT fid,
            fid*3 + 0.25 AS x0, fid*2 + 0.5 AS y0,
            fid*3 + 2.75 AS x1, fid*2 + 2.25 AS y1
          FROM range(10) t(fid)),
        c AS (SELECT f.fid, f.x0, f.y0, f.x1, f.y1, cx.cx, cy.cy
          FROM f, range(0, 32) cx(cx), range(0, 22) cy(cy)
          WHERE cx.cx >= FLOOR(f.x0) AND cx.cx < CEIL(f.x1)
            AND cy.cy >= FLOOR(f.y0) AND cy.cy < CEIL(f.y1))
        SELECT fid, CAST(cx AS INTEGER) AS cx, CAST(cy AS INTEGER) AS cy,
          (LEAST(x1, CAST(cx + 1 AS DOUBLE)) - GREATEST(x0, CAST(cx AS DOUBLE)))
          * (LEAST(y1, CAST(cy + 1 AS DOUBLE)) - GREATEST(y0, CAST(cy AS DOUBLE))) AS frac
        FROM c""",
    // closed-form rect∩tile with string-exact canonical WKT (CCW from the
    // bottom-left vertex — the engine canonicalizes clip output to exactly
    // this form); DuckDB CAST(DOUBLE AS VARCHAR) prints quarter-dyadics
    // identically to Java Double.toString
    "vector_tile_clip" ->
      """WITH f AS (SELECT fid, fid*1.75 + 0.25 AS x0, fid*1.25 + 0.5 AS y0,
            fid*1.75 + 6.75 AS x1, fid*1.25 + 4.25 AS y1 FROM range(12) t(fid)),
        c AS (SELECT fid, CAST(tx.tx AS INTEGER) AS tx, CAST(ty.ty AS INTEGER) AS ty,
            GREATEST(x0, tx.tx * 4.0) AS cx0, GREATEST(y0, ty.ty * 4.0) AS cy0,
            LEAST(x1, tx.tx * 4.0 + 4.0) AS cx1, LEAST(y1, ty.ty * 4.0 + 4.0) AS cy1
          FROM f, range(0, 8) tx(tx), range(0, 6) ty(ty))
        SELECT fid, tx, ty, (cx1 - cx0) * (cy1 - cy0) AS part_area,
          'POLYGON ((' || CAST(cx0 AS VARCHAR) || ' ' || CAST(cy0 AS VARCHAR) || ', '
            || CAST(cx1 AS VARCHAR) || ' ' || CAST(cy0 AS VARCHAR) || ', '
            || CAST(cx1 AS VARCHAR) || ' ' || CAST(cy1 AS VARCHAR) || ', '
            || CAST(cx0 AS VARCHAR) || ' ' || CAST(cy1 AS VARCHAR) || ', '
            || CAST(cx0 AS VARCHAR) || ' ' || CAST(cy0 AS VARCHAR) || '))' AS wkt
        FROM c WHERE cx1 > cx0 AND cy1 > cy0""",
    // pinned constants (pin_oracle.py flow): per-row sequential trig fold,
    // verified bit-stable local[2] vs local[8] before pinning
    "geo_sph_area" -> """SELECT * FROM (VALUES
      (0, '12391399902.071104'::DOUBLE),
      (1, '7882199726.472636'::DOUBLE),
      (2, '532400015441.36896'::DOUBLE),
      (3, '679207896806.537'::DOUBLE))
      AS t("fid", "area_m2")""",
    // pinned constants (pin_oracle.py flow): per-row quadtree refinement
    // with a total cell order — verified bit-stable local[2] vs local[32]
    "vector_polylabel" -> """SELECT * FROM (VALUES
      (0, '2.3431396484375'::DOUBLE, '2.3431396484375'::DOUBLE, '2.3431396484375'::DOUBLE),
      (1, '15.0'::DOUBLE, '5.0'::DOUBLE, '5.0'::DOUBLE),
      (2, '3.4796142578125'::DOUBLE, '2.4407958984375'::DOUBLE, '2.3235182713948768'::DOUBLE),
      (3, '7.27764892578125'::DOUBLE, '7.14825439453125'::DOUBLE, '5.854556587409686'::DOUBLE))
      AS t("fid", "px", "py", "clearance")""",
"vector_simplify" -> """SELECT * FROM (VALUES
      (0, 10, 6, 'LINESTRING (0.0 -6.0, 3.0 6.0, 4.0 -3.0, 6.0 5.0, 7.0 -4.0, 9.0 4.0)'),
      (1, 10, 7, 'LINESTRING (0.0 -1.0, 1.0 3.0, 2.0 -6.0, 5.0 6.0, 6.0 -3.0, 8.0 5.0, 9.0 -4.0)'),
      (10, 10, 7, 'LINESTRING (0.0 5.0, 1.0 -4.0, 3.0 4.0, 4.0 -5.0, 6.0 3.0, 7.0 -6.0, 9.0 2.0)'),
      (11, 10, 7, 'LINESTRING (0.0 -3.0, 2.0 5.0, 3.0 -4.0, 5.0 4.0, 6.0 -5.0, 8.0 3.0, 9.0 -6.0)'),
      (12, 10, 8, 'LINESTRING (0.0 2.0, 1.0 6.0, 2.0 -3.0, 4.0 5.0, 5.0 -4.0, 7.0 4.0, 8.0 -5.0, 9.0 -1.0)'),
      (13, 10, 6, 'LINESTRING (0.0 -6.0, 3.0 6.0, 4.0 -3.0, 6.0 5.0, 7.0 -4.0, 9.0 4.0)'),
      (14, 10, 7, 'LINESTRING (0.0 -1.0, 1.0 3.0, 2.0 -6.0, 5.0 6.0, 6.0 -3.0, 8.0 5.0, 9.0 -4.0)'),
      (15, 10, 7, 'LINESTRING (0.0 4.0, 1.0 -5.0, 3.0 3.0, 4.0 -6.0, 7.0 6.0, 8.0 -3.0, 9.0 1.0)'),
      (16, 10, 6, 'LINESTRING (0.0 -4.0, 2.0 4.0, 3.0 -5.0, 5.0 3.0, 6.0 -6.0, 9.0 6.0)'),
      (17, 10, 8, 'LINESTRING (0.0 1.0, 1.0 5.0, 2.0 -4.0, 4.0 4.0, 5.0 -5.0, 7.0 3.0, 8.0 -6.0, 9.0 -2.0)'),
      (18, 10, 7, 'LINESTRING (0.0 6.0, 1.0 -3.0, 3.0 5.0, 4.0 -4.0, 6.0 4.0, 7.0 -5.0, 9.0 3.0)'),
      (19, 10, 7, 'LINESTRING (0.0 -2.0, 2.0 6.0, 3.0 -3.0, 5.0 5.0, 6.0 -4.0, 8.0 4.0, 9.0 -5.0)'),
      (2, 10, 7, 'LINESTRING (0.0 4.0, 1.0 -5.0, 3.0 3.0, 4.0 -6.0, 7.0 6.0, 8.0 -3.0, 9.0 1.0)'),
      (20, 10, 8, 'POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), (2.0 2.0, 6.0 2.0, 6.0 6.0, 2.0 6.0, 2.0 2.0))'),
      (21, 10, 8, 'POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), (2.0 2.0, 6.0 2.0, 6.0 6.0, 2.0 6.0, 2.0 2.0))'),
      (22, 10, 10, 'POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 5.0 11.3, 0.0 10.0, 0.0 0.0), (2.0 2.0, 6.0 2.0, 6.0 6.0, 4.0 7.3, 2.0 6.0, 2.0 2.0))'),
      (23, 10, 10, 'POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 5.0 11.8, 0.0 10.0, 0.0 0.0), (2.0 2.0, 6.0 2.0, 6.0 6.0, 4.0 7.8, 2.0 6.0, 2.0 2.0))'),
      (3, 10, 6, 'LINESTRING (0.0 -4.0, 2.0 4.0, 3.0 -5.0, 5.0 3.0, 6.0 -6.0, 9.0 6.0)'),
      (4, 10, 8, 'LINESTRING (0.0 1.0, 1.0 5.0, 2.0 -4.0, 4.0 4.0, 5.0 -5.0, 7.0 3.0, 8.0 -6.0, 9.0 -2.0)'),
      (5, 10, 7, 'LINESTRING (0.0 6.0, 1.0 -3.0, 3.0 5.0, 4.0 -4.0, 6.0 4.0, 7.0 -5.0, 9.0 3.0)'),
      (6, 10, 7, 'LINESTRING (0.0 -2.0, 2.0 6.0, 3.0 -3.0, 5.0 5.0, 6.0 -4.0, 8.0 4.0, 9.0 -5.0)'),
      (7, 10, 7, 'LINESTRING (0.0 3.0, 1.0 -6.0, 4.0 6.0, 5.0 -3.0, 7.0 5.0, 8.0 -4.0, 9.0 0.0)'),
      (8, 10, 6, 'LINESTRING (0.0 -5.0, 2.0 3.0, 3.0 -6.0, 6.0 6.0, 7.0 -3.0, 9.0 5.0)'),
      (9, 10, 7, 'LINESTRING (0.0 0.0, 1.0 4.0, 2.0 -5.0, 4.0 3.0, 5.0 -6.0, 8.0 6.0, 9.0 -3.0)'))
      AS t("fid", "n_in", "n_out", "wkt")""",

    "web_links" ->
      // identical HTML rebuilt in SQL, identical regex replayed by
      // DuckDB's RE2 (no lookaround/backrefs -> engines agree), 1-based
      // subscripts shifted to posexplode's 0-based ordinal
      """WITH h AS (SELECT doc_id,
           '<!DOCTYPE html><html><head><title>t</title></head><body><p>' || text || '</p>' ||
           CASE WHEN doc_id % 11 = 0 THEN '' ELSE
             '<a class="nav" href="https://host' || CAST((doc_id * 31 + 7) % 97 AS VARCHAR) ||
             '.example/a' || CAST(doc_id AS VARCHAR) ||
             '">one</a><img src="skip.png"/><a href="https://host' ||
             CAST((doc_id * 17 + 3) % 97 AS VARCHAR) ||
             '.example/b' || CAST(doc_id AS VARCHAR) || '">two</a>' END
           || '</body></html>' AS html
           FROM documents),
         x AS (SELECT doc_id,
           regexp_extract_all(html, '<a[^>]*href="([^"]*)"', 1) AS hrefs FROM h)
         SELECT doc_id,
           CAST(generate_subscripts(hrefs, 1) - 1 AS INT) AS link_no,
           unnest(hrefs) AS href
         FROM x""",

    "web_anchors" ->
      // identical fixture HTML rebuilt in SQL; the two capture groups of
      // the SAME pattern are extracted as parallel lists and DuckDB's
      // positional multi-unnest zips them, exactly like arrays_zip
      (sqlAnchorFixture +
        """ SELECT doc_id,
           CAST(generate_subscripts(hrefs, 1) - 1 AS INT) AS link_no,
           unnest(hrefs) AS href, unnest(texts) AS anchor
         FROM x"""),

    "web_anchor_terms" ->
      (sqlAnchorFixture +
        """, a AS (SELECT unnest(hrefs) AS href, unnest(texts) AS anchor FROM x),
         t AS (SELECT href, tok AS term FROM
           (SELECT href, unnest(string_split(anchor, ' ')) AS tok FROM a)
           WHERE tok <> ''),
         c AS (SELECT href, term, CAST(count(*) AS BIGINT) AS cnt
               FROM t GROUP BY 1, 2)
         SELECT href, term, cnt, CAST(rnk AS INT) AS rank FROM (
           SELECT *, row_number() OVER (PARTITION BY href
             ORDER BY cnt DESC, term) AS rnk FROM c)
         WHERE rnk <= 3"""),

    "text_inverted" -> (sqlToks +
      """, d AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
                 FROM dtoks GROUP BY tok),
         r AS (SELECT tok, doc_id, row_number() OVER (PARTITION BY tok
                 ORDER BY doc_id) AS rn FROM dtoks)
         SELECT r.tok, d.df, CAST(r.rn - 1 AS INT) AS slot, r.doc_id
         FROM r JOIN d USING (tok)
         WHERE d.df >= 2 AND r.rn <= 8"""),

    "web_robots" ->
      // the oracle RE-PARSES the same synthesized robots.txt with SQL
      // windows (lag → running-sum group ids → star-group join) and
      // replays longest-match-then-allow as max(2*len + isAllow)
      """WITH hostsk AS (SELECT DISTINCT doc_id % 97 AS k FROM documents),
        robots AS (SELECT k,
          'User-Agent: megabot' || chr(10) || 'Disallow: /' || chr(10) || chr(10) ||
          'User-Agent: *' || chr(10) || 'Disallow: /' || CAST(k % 10 AS VARCHAR) || chr(10) ||
          'Allow: /' || CAST(k % 10 AS VARCHAR) || CAST(k % 7 AS VARCHAR) || chr(10) ||
          'Disallow:' AS txt FROM hostsk),
        lines AS (SELECT k,
          generate_subscripts(string_split(txt, chr(10)), 1) AS pos,
          unnest(string_split(txt, chr(10))) AS line FROM robots),
        marked AS (SELECT k, pos, line,
          (lower(trim(line)) LIKE 'user-agent:%') AS is_ua FROM lines),
        lagged AS (SELECT k, pos, line, is_ua,
          COALESCE(LAG(is_ua) OVER (PARTITION BY k ORDER BY pos), false) AS prev_ua
          FROM marked),
        grps AS (SELECT k, pos, line, is_ua,
          SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
            OVER (PARTITION BY k ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
          FROM lagged),
        stars AS (SELECT DISTINCT k, grp FROM grps
          WHERE is_ua AND trim(substr(trim(line), instr(trim(line), ':') + 1)) = '*'),
        rules AS (SELECT g.k,
            trim(substr(trim(g.line), instr(trim(g.line), ':') + 1)) AS prefix,
            (lower(trim(g.line)) LIKE 'allow:%') AS allow
          FROM grps g JOIN stars s ON g.k = s.k AND g.grp = s.grp
          WHERE (lower(trim(g.line)) LIKE 'allow:%' OR lower(trim(g.line)) LIKE 'disallow:%')
            AND trim(substr(trim(g.line), instr(trim(g.line), ':') + 1)) <> ''),
        pp AS (SELECT doc_id, doc_id % 97 AS k,
          'host' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host,
          '/' || CAST(doc_id AS VARCHAR) AS path FROM documents),
        sc AS (SELECT p.doc_id, p.host, p.path,
          MAX(CASE WHEN substr(p.path, 1, length(r.prefix)) = r.prefix
                   THEN length(r.prefix) * 2 + CASE WHEN r.allow THEN 1 ELSE 0 END END) AS s
          FROM pp p LEFT JOIN rules r ON r.k = p.k
          GROUP BY 1, 2, 3)
        SELECT doc_id, host, path, COALESCE(s % 2 = 1, true) AS allowed FROM sc""",

    "web_adjacency" ->
      """WITH e AS (SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst
             FROM documents
           UNION ALL
           SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents),
         de AS (SELECT DISTINCT src, dst FROM e),
         g AS (SELECT src, dst,
             lag(dst) OVER (PARTITION BY src ORDER BY dst) AS prev FROM de),
         enc AS (SELECT src,
             CASE WHEN prev IS NULL THEN
               CASE WHEN dst - src >= 0 THEN (dst - src) * 2
                    ELSE (src - dst) * 2 - 1 END
             ELSE dst - prev END AS enc FROM g)
        SELECT src, CAST(count(*) AS BIGINT) AS degree,
          CAST(sum(CASE WHEN enc < 128 THEN 1 WHEN enc < 16384 THEN 2
                        WHEN enc < 2097152 THEN 3 WHEN enc < 268435456 THEN 4
                        ELSE 5 END) AS BIGINT) AS bytes,
          CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
          CAST(sum(CASE WHEN enc < 128 THEN 1 WHEN enc < 16384 THEN 2
                        WHEN enc < 2097152 THEN 3 WHEN enc < 268435456 THEN 4
                        ELSE 5 END) * 1000000
               // (count(*) * 8) AS BIGINT) AS ratio_ppm
        FROM enc GROUP BY src""",
    "web_adjacency_rice" ->
      s"""WITH e AS (SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst
             FROM documents
           UNION ALL
           SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents),
         de AS (SELECT DISTINCT src, dst FROM e),
         g AS (SELECT src, dst,
             lag(dst) OVER (PARTITION BY src ORDER BY dst) AS prev FROM de),
         enc AS (SELECT src,
             CASE WHEN prev IS NULL THEN
               CASE WHEN dst - src >= 0 THEN (dst - src) * 2
                    ELSE (src - dst) * 2 - 1 END
             ELSE dst - prev END AS enc FROM g),
         kk AS (SELECT src, enc,
             (${WebOps.floorLog2Sql(
                 "greatest(1, (sum(enc) OVER (PARTITION BY src)) // (count(*) OVER (PARTITION BY src)))")})
               AS k FROM enc)
        SELECT src, CAST(count(*) AS BIGINT) AS degree,
          CAST(max(k) AS INT) AS k,
          CAST(sum((enc >> k) + 1 + k) AS BIGINT) AS rice_bits,
          CAST((sum((enc >> k) + 1 + k) + 7) // 8 AS BIGINT) AS rice_bytes,
          CAST(sum(CASE WHEN enc < 128 THEN 1 WHEN enc < 16384 THEN 2
                        WHEN enc < 2097152 THEN 3 WHEN enc < 268435456 THEN 4
                        ELSE 5 END) AS BIGINT) AS varint_bytes
        FROM kk GROUP BY src""",
    "web_pagerank" -> webPagerankOracle,

    "web_hyperball" -> webHyperballOracle,

    "web_pagerank_weighted" -> webPagerankWeightedOracle,

    "web_ball_profile" -> webBallProfileOracle,

    "web_crawl_priority" ->
      s"""WITH pr AS (SELECT host, rank FROM ($webPagerankOracle)),
         pg AS (SELECT doc_id % 97 AS host, CAST(count(*) AS BIGINT) AS n_pages
           FROM documents GROUP BY 1)
        SELECT pr.host, pr.rank, pg.n_pages,
          CAST(CAST(pr.rank AS HUGEINT) * pg.n_pages AS DECIMAL(38,0)) AS priority
        FROM pr JOIN pg ON pr.host = pg.host
        ORDER BY priority DESC, pr.host LIMIT 20""",

    "orders_pareto" ->
      """WITH per AS (SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 10000.0) AS BIGINT)) AS BIGINT) AS rev_q
         FROM orders GROUP BY 1),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
              CAST(sum(rev_q) AS BIGINT) AS total_q FROM per),
        r AS (SELECT o_custkey, rev_q,
            row_number() OVER (ORDER BY rev_q DESC, o_custkey) AS rank,
            sum(rev_q) OVER (ORDER BY rev_q DESC, o_custkey
                             ROWS UNBOUNDED PRECEDING) AS cum_q
          FROM per)
        SELECT d.decile, CAST(r.rank AS BIGINT) AS n_top,
          CAST(r.cum_q AS BIGINT) AS cum_q, n.total_q,
          CAST(CAST(r.cum_q AS HUGEINT) * 1000000 // n.total_q AS BIGINT) AS share_ppm
        FROM r CROSS JOIN n
        JOIN range(1, 11) d(decile) ON r.rank = n.n_cust * d.decile // 10""",

    "text_burstiness" -> (sqlToks +
      """, pd AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        pt AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
            CAST(sum(c) AS BIGINT) AS sum_c,
            CAST(sum(c * c) AS BIGINT) AS sum_c2
          FROM pd GROUP BY 1 HAVING count(*) >= 3),
        sc AS (SELECT pt.*, nt.n_docs,
            CAST((1000000 * (CAST(nt.n_docs AS HUGEINT) * pt.sum_c2
                             - CAST(pt.sum_c AS HUGEINT) * pt.sum_c))
                 // (CAST(nt.n_docs AS HUGEINT) * pt.sum_c) AS BIGINT) AS vmr_ppm
          FROM pt CROSS JOIN nt)
        SELECT tok, df, sum_c, sum_c2, vmr_ppm, CAST(rnk AS BIGINT) AS rnk
        FROM (SELECT *, row_number() OVER
            (ORDER BY vmr_ppm DESC, tok) AS rnk FROM sc)
        WHERE rnk <= 20"""),

    "text_vocab_growth" -> (sqlToks +
      """, vfirst AS (SELECT tok, min(doc_id) AS first_doc FROM dtoks GROUP BY 1),
        nt AS (SELECT count(*) AS n_total FROM documents),
        steps AS (SELECT 50 * (1 << i) AS n_docs_prefix FROM range(12) t(i))
        SELECT s.n_docs_prefix, CAST(count(*) AS BIGINT) AS vocab
        FROM vfirst f CROSS JOIN nt
        JOIN steps s ON s.n_docs_prefix <= nt.n_total
        WHERE f.first_doc < s.n_docs_prefix
        GROUP BY 1"""),

    "orders_ltv" ->
      """WITH o AS (SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ord_m,
           CAST(round(o_totalprice * 10000.0) AS BIGINT) AS vq
         FROM orders),
        c AS (SELECT *, min(ord_m) OVER (PARTITION BY o_custkey) AS cohort_m FROM o)
        SELECT cohort_m, ord_m - cohort_m AS month_idx,
          CAST(count(*) AS BIGINT) AS n_orders,
          CAST(sum(vq) AS BIGINT) AS revenue_q,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM c GROUP BY 1, 2""",

    "web_crawl_delay" ->
      // the same lag → running-sum → star-group-join machinery as the
      // web_robots oracle, on crawl-delay lines with TRY_CAST dropping
      // the invalid value
      """WITH hostsk AS (SELECT DISTINCT doc_id % 97 AS k FROM documents),
        robots AS (SELECT k,
          'host' || CAST(k AS VARCHAR) || '.example' AS host,
          'User-Agent: megabot' || chr(10) || 'Crawl-delay: 99' || chr(10) ||
          chr(10) || 'User-Agent: *' || chr(10) || 'Disallow: /x' || chr(10) ||
          'Crawl-Delay: ' || CAST(k % 7 AS VARCHAR) ||
          CASE WHEN k % 2 = 0
               THEN chr(10) || 'crawl-delay: ' || CAST(k % 5 AS VARCHAR) || '.5'
               ELSE '' END ||
          CASE WHEN k % 3 = 0 THEN chr(10) || 'Crawl-delay: soon' ELSE '' END
          AS txt FROM hostsk),
        lines AS (SELECT host,
          generate_subscripts(string_split(txt, chr(10)), 1) AS pos,
          unnest(string_split(txt, chr(10))) AS line FROM robots),
        marked AS (SELECT host, pos, line,
          (lower(trim(line)) LIKE 'user-agent:%') AS is_ua FROM lines),
        lagged AS (SELECT host, pos, line, is_ua,
          COALESCE(LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), false) AS prev_ua
          FROM marked),
        grps AS (SELECT host, pos, line, is_ua,
          SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
            OVER (PARTITION BY host ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
          FROM lagged),
        stars AS (SELECT DISTINCT host, grp FROM grps
          WHERE is_ua AND trim(substr(trim(line), instr(trim(line), ':') + 1)) = '*'),
        d AS (SELECT g.host,
            TRY_CAST(trim(substr(trim(g.line), instr(trim(g.line), ':') + 1))
                     AS DOUBLE) AS delay
          FROM grps g JOIN stars s ON g.host = s.host AND g.grp = s.grp
          WHERE lower(trim(g.line)) LIKE 'crawl-delay:%')
        SELECT host, MAX(delay) AS crawl_delay_sec, COUNT(*) AS n_directives
        FROM d WHERE delay IS NOT NULL GROUP BY host""",

    "web_sitemaps" ->
      // re-split the same synthesized robots.txt; the LIKE prefix test,
      // first-colon value extraction, and empty-value drop replay the
      // engine's codegen'd string ops exactly (pos is 0-based in Spark's
      // posexplode, 1-based in generate_subscripts — hence pos - 1)
      """WITH hostsk AS (SELECT DISTINCT doc_id % 97 AS k FROM documents),
        robots AS (SELECT 'host' || CAST(k AS VARCHAR) || '.example' AS host,
          'Sitemap: https://host' || CAST(k AS VARCHAR) || '.example/s' ||
            CAST(k % 3 AS VARCHAR) || '.xml' || chr(10) ||
          'User-Agent: *' || chr(10) || 'Disallow: /x' || chr(10) ||
          'sitemapfoo: junk' || chr(10) ||
          CASE WHEN k % 2 = 0 THEN 'sitemap: https://host' || CAST(k AS VARCHAR)
            || '.example/alt.xml' || chr(10) ELSE '' END ||
          'Sitemap:' || chr(10) ||
          'Sitemap: https://host' || CAST(k AS VARCHAR) || '.example/last.xml'
          AS txt FROM hostsk),
        lines AS (SELECT host,
          generate_subscripts(string_split(txt, chr(10)), 1) - 1 AS pos,
          unnest(string_split(txt, chr(10))) AS line FROM robots),
        hits AS (SELECT host,
            trim(substr(trim(line), instr(trim(line), ':') + 1)) AS sitemap,
            CAST(pos AS INT) AS ord
          FROM lines WHERE lower(trim(line)) LIKE 'sitemap:%')
        SELECT host, sitemap, ord FROM hits WHERE sitemap <> ''""",

    "web_scc_seed" -> {
      // forward and backward 8-round min-hop relaxation chains joined on
      // host — the SQL twin of sccOfSeed's two frontier BFS passes
      def chain(p: String, srcCol: String, dstCol: String): String = {
        val iters = (1 to 8).map { k =>
          s""", $p$k AS (
               SELECT host, CAST(MIN(hops) AS INT) AS hops FROM (
                 SELECT host, hops FROM $p${k - 1}
                 UNION ALL
                 SELECT e.$dstCol AS host, r.hops + 1 AS hops
                 FROM $p${k - 1} r JOIN edges e ON r.host = e.$srcCol)
               GROUP BY host)"""
        }.mkString("\n")
        s""", ${p}0 AS (SELECT CAST(0 AS BIGINT) AS host, CAST(0 AS INT) AS hops)
           $iters"""
      }
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst)
         ${chain("f", "src", "dst")}
         ${chain("b", "dst", "src")}
         SELECT f8.host, f8.hops AS hops_fwd, b8.hops AS hops_bwd
         FROM f8 JOIN b8 ON f8.host = b8.host"""
    },

    "web_cocite" ->
      """WITH e AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 29 AS src, (doc_id * 31 + 7) % 29 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 29, (doc_id * 17 + 3) % 29 FROM documents
             UNION ALL
             SELECT doc_id % 29, (doc_id * 23 + 11) % 29 FROM documents)
           WHERE src <> dst),
         c AS (SELECT src, dst,
                 row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
               FROM e),
         capped AS (SELECT src, dst FROM c WHERE rn <= 2)
         SELECT a.dst AS t1, b.dst AS t2, COUNT(*) AS n_shared
         FROM capped a JOIN capped b ON a.src = b.src AND a.dst < b.dst
         GROUP BY 1, 2
         HAVING COUNT(*) >= 1""",

    "crawl_diff" ->
      // latest fetch per URL per side (warc_sec is strictly increasing in
      // doc_id, so the engine's max-of-struct argmax is max doc_id), then
      // text equality across a full outer join — md5 equality in the
      // engine iff text equality here
      Pages.sqlWith("""
        , p AS (SELECT doc_id, doc_id % 150 AS m, warc_sec,
            CASE WHEN (doc_id % 150) % 3 = 0
                 THEN 'c' || CAST(doc_id % 150 AS VARCHAR)
                 ELSE text END AS t
          FROM pages),
        a AS (SELECT m, t FROM p WHERE m < 120
              QUALIFY row_number() OVER (PARTITION BY m ORDER BY doc_id DESC) = 1),
        b AS (SELECT m,
                t || CASE WHEN m % 5 = 0 THEN ' v2' ELSE '' END AS t
              FROM p WHERE m >= 30
              QUALIFY row_number() OVER (PARTITION BY m ORDER BY doc_id DESC) = 1)
        SELECT 'crawl.example/p' || CAST(COALESCE(a.m, b.m) AS VARCHAR) AS norm_url,
          CASE WHEN a.m IS NULL THEN 'added'
               WHEN b.m IS NULL THEN 'removed'
               WHEN a.t = b.t THEN 'unchanged'
               ELSE 'changed' END AS status
        FROM a FULL OUTER JOIN b ON a.m = b.m"""),

    "web_dup_report" ->
      Pages.sqlWith("""
        , p AS (SELECT 'host' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host,
            md5(CASE WHEN doc_id % 3 = 0
                     THEN 'template-' || CAST(doc_id % 97 AS VARCHAR)
                     ELSE text END) AS h
          FROM pages)
        SELECT host, COUNT(*) AS n_pages, COUNT(DISTINCT h) AS n_unique,
          CAST(((COUNT(*) - COUNT(DISTINCT h)) * CAST(1000000 AS HUGEINT))
               // COUNT(*) AS BIGINT) AS dup_ppm
        FROM p GROUP BY host"""),

    "url_features" ->
      Pages.sqlWith("""
        , u AS (SELECT doc_id,
            'https://host' || CAST(doc_id % 97 AS VARCHAR) || '.example/sec'
            || CAST(doc_id % 7 AS VARCHAR)
            || CASE WHEN doc_id % 3 = 0
                 THEN '/page' || CAST(doc_id AS VARCHAR) || '.html'
                 ELSE '/' || CAST(doc_id AS VARCHAR) END
            || CASE WHEN doc_id % 4 = 0 THEN '?ref=rss' ELSE '' END AS url
          FROM pages),
        s AS (SELECT doc_id, url,
            regexp_replace(regexp_replace(regexp_replace(url,
              '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''), '#.*$', ''), '\?.*$', '')
              AS nq
          FROM u),
        p AS (SELECT doc_id, url,
            COALESCE(NULLIF(regexp_extract(nq, '(/.*)$', 1), ''), '/') AS path
          FROM s)
        SELECT doc_id,
          'host' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host,
          path,
          CAST(length(path) - length(replace(path, '/', '')) AS BIGINT) AS depth,
          CAST(length(path) AS BIGINT) AS path_len,
          CAST(length(regexp_replace(path, '[^0-9]', '', 'g')) AS BIGINT)
            AS n_digits,
          contains(url, '?') AS has_query,
          regexp_matches(path, '\.[a-z0-9]{1,5}$') AS has_ext
        FROM p"""),

    "url_change_rate" ->
      // same (warc_sec, hash)-ordered lag walk per canonical URL; md5 is
      // lowercase hex in both engines so version identity agrees
      Pages.sqlWith("""
        , p AS (SELECT
            'crawl.example/p' || CAST(doc_id % 100 AS VARCHAR) AS norm_url,
            warc_sec,
            md5(CASE WHEN (doc_id % 100) % 3 = 0
                     THEN 'stable-' || CAST(doc_id % 100 AS VARCHAR)
                     ELSE text END) AS h
          FROM pages),
        q AS (SELECT norm_url, warc_sec, h,
            lag(h) OVER (PARTITION BY norm_url ORDER BY warc_sec, h) AS prev
          FROM p)
        SELECT norm_url, COUNT(*) AS n_fetches,
          COUNT(DISTINCT h) AS n_versions,
          COUNT(CASE WHEN prev IS NOT NULL AND prev <> h THEN 1 END)
            AS n_changes,
          MIN(warc_sec) AS first_sec, MAX(warc_sec) AS last_sec
        FROM q GROUP BY norm_url"""),

    "url_hll_regs" ->
      // replay hash60 (top 60 bits of md5), the p=9 bucket/suffix split,
      // and the rank = 52 − bit_length(suffix) rule; to_base(rest, 2) is
      // DuckDB's twin of Spark's conv(rest, 10, 2)
      Pages.sqlWith("""
        , n AS (SELECT lang,
            'host' || CAST(doc_id % 97 AS VARCHAR) || '.example/' ||
              CAST(doc_id AS VARCHAR) AS nurl
          FROM pages),
        h AS (SELECT lang,
            CAST('0x' || substr(md5(nurl), 1, 15) AS BIGINT) AS h60 FROM n),
        r AS (SELECT lang, h60 & 511 AS reg_no, h60 >> 9 AS rest FROM h),
        k AS (SELECT lang, reg_no,
            CASE WHEN rest = 0 THEN 52
                 ELSE 52 - length(to_base(rest, 2)) END AS rank FROM r)
        SELECT lang, reg_no, CAST(MAX(rank) AS INT) AS reg
        FROM k GROUP BY lang, reg_no"""),

    "url_kmv" ->
      // replay hash60 (top 60 bits of md5) over DISTINCT keys, rank by
      // hash per lang, keep the bottom 16
      Pages.sqlWith("""
        , n AS (SELECT lang,
            'host' || CAST(doc_id % 97 AS VARCHAR) || '.example/' ||
              CAST(doc_id AS VARCHAR) AS nurl
          FROM pages),
        h AS (SELECT DISTINCT lang,
            CAST('0x' || substr(md5(nurl), 1, 15) AS BIGINT) AS hv FROM n),
        r AS (SELECT lang, hv,
            row_number() OVER (PARTITION BY lang ORDER BY hv) AS slot FROM h)
        SELECT lang, CAST(slot AS INT) AS slot, hv FROM r WHERE slot <= 16"""),

    "url_kmv_est" ->
      // fold the bottom-16 registers to (n_slots, kth, est) with the
      // exact integer estimator ⌊15·2^60 / kth⌋ (HUGEINT headroom)
      Pages.sqlWith("""
        , n AS (SELECT lang,
            'host' || CAST(doc_id % 97 AS VARCHAR) || '.example/' ||
              CAST(doc_id AS VARCHAR) AS nurl
          FROM pages),
        h AS (SELECT DISTINCT lang,
            CAST('0x' || substr(md5(nurl), 1, 15) AS BIGINT) AS hv FROM n),
        r AS (SELECT lang, hv,
            row_number() OVER (PARTITION BY lang ORDER BY hv) AS slot FROM h),
        b AS (SELECT lang, slot, hv FROM r WHERE slot <= 16)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_slots,
          max(CASE WHEN slot = 16 THEN hv END) AS kth,
          CAST(CASE WHEN count(*) < 16 THEN count(*)
               ELSE CAST(15 AS HUGEINT) * 1152921504606846976
                    // max(CASE WHEN slot = 16 THEN hv END) END AS BIGINT) AS est
        FROM b GROUP BY lang"""),

    "url_host_hll" ->
      // same register table folded to the integer summary: occupied
      // count, zeros, and zint = Σ 2^(52−M_j) over all 512 registers
      // (empty registers at rank 0 contribute 2^52 each)
      Pages.sqlWith("""
        , n AS (SELECT lang,
            'host' || CAST(doc_id % 97 AS VARCHAR) || '.example/' ||
              CAST(doc_id AS VARCHAR) AS nurl
          FROM pages),
        h AS (SELECT lang,
            CAST('0x' || substr(md5(nurl), 1, 15) AS BIGINT) AS h60 FROM n),
        r AS (SELECT lang, h60 & 511 AS reg_no, h60 >> 9 AS rest FROM h),
        k AS (SELECT lang, reg_no,
            CASE WHEN rest = 0 THEN 52
                 ELSE 52 - length(to_base(rest, 2)) END AS rank FROM r),
        regs AS (SELECT lang, reg_no, MAX(rank) AS reg
                 FROM k GROUP BY lang, reg_no),
        s AS (SELECT lang, COUNT(*) AS nonzero,
                SUM(CAST((CAST(1 AS BIGINT) << (52 - reg)) AS HUGEINT)) AS znon
              FROM regs GROUP BY lang)
        SELECT lang, nonzero, 512 - nonzero AS zeros,
          CAST(znon + CAST((512 - nonzero) AS HUGEINT) *
               (CAST(1 AS BIGINT) << 52) AS DECIMAL(38,0)) AS zint
        FROM s"""),

    "web_langmix" ->
      Pages.sqlWith("""
        , c AS (SELECT 'host' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host,
            lang, COUNT(*) AS c
          FROM pages GROUP BY 1, 2)
        SELECT host, CAST(SUM(c) AS BIGINT) AS n_pages,
          COUNT(*) AS n_langs,
          CAST((CAST(SUM(c) AS HUGEINT) * SUM(c)
                - SUM(CAST(c AS HUGEINT) * c)) * 1000000
               // (CAST(SUM(c) AS HUGEINT) * SUM(c)) AS BIGINT) AS gini_ppm
        FROM c GROUP BY host"""),

    "web_templates" ->
      // rebuild the head lattice, pull the opening-tag sequence with the
      // same regex, md5 the joined names
      Pages.sqlWith("""
        , h AS (SELECT doc_id,
            '<html><head><title>Page ' || CAST(doc_id AS VARCHAR) || '</title>'
            || CASE WHEN doc_id % 2 = 0
                 THEN '<meta name="description" content="desc '
                      || CAST(doc_id AS VARCHAR) || '"/>' ELSE '' END
            || CASE WHEN doc_id % 3 = 0
                 THEN '<link rel="canonical" href="https://canon.example/'
                      || CAST(doc_id % 50 AS VARCHAR) || '"/>' ELSE '' END
            || CASE WHEN doc_id % 5 <> 0
                 THEN '<meta charset="utf-8"/>' ELSE '' END
            || '</head><body>' || substr(text, 1, 30) || '</body></html>'
            AS html
          FROM pages),
        t AS (SELECT doc_id,
            md5(array_to_string(
              regexp_extract_all(html, '<([a-z][a-z0-9]*)', 1), ',')) AS template
          FROM h)
        SELECT template, COUNT(*) AS n_pages, MIN(doc_id) AS example_doc
        FROM t GROUP BY template"""),

    "web_redirects" -> {
      // one-hop relaxation unrolled 9 rounds (the fixture's max chain) —
      // resolved finals/hops are algorithm-independent; cycle rows are
      // masked NULL on both sides, so the doubling schedule never leaks
      def round(i: Int): String =
        s""", r$i AS (SELECT p.src, COALESCE(n.dst, p.cur) AS cur,
               p.hops + CASE WHEN n.dst IS NOT NULL THEN 1 ELSE 0 END AS hops
             FROM r${i - 1} p LEFT JOIN f n ON p.cur = n.src)"""
      s"""WITH ms AS (SELECT DISTINCT doc_id % 200 AS m FROM documents),
         e AS (SELECT m AS src,
             CASE WHEN (m // 10) % 4 = 3 THEN (m // 10) * 10 + (m % 10 + 1) % 10
                  WHEN m % 10 < 9 THEN m + 1 END AS dst
           FROM ms),
         f AS (SELECT src, dst FROM e WHERE dst IS NOT NULL AND dst <> src),
         r0 AS (SELECT src, dst AS cur, 1 AS hops FROM f)
         ${(1 to 9).map(round).mkString("\n")}
         SELECT 'https://r.example/' || CAST(r9.src AS VARCHAR) AS src,
           CASE WHEN t.src IS NULL
                THEN 'https://r.example/' || CAST(r9.cur AS VARCHAR) END AS final,
           CASE WHEN t.src IS NULL THEN CAST(r9.hops AS BIGINT) END AS hops,
           CASE WHEN t.src IS NULL THEN 'resolved'
                ELSE 'cycle_or_long' END AS status
         FROM r9 LEFT JOIN (SELECT DISTINCT src FROM f) t ON r9.cur = t.src"""
    },

    "html_meta" ->
      // rebuild the same head and replay the four first-match extracts;
      // both engines return '' on no match
      Pages.sqlWith("""
        , h AS (SELECT doc_id,
            '<html><head><title>Page ' || CAST(doc_id AS VARCHAR) || '</title>'
            || CASE WHEN doc_id % 2 = 0
                 THEN '<meta name="description" content="desc '
                      || CAST(doc_id AS VARCHAR) || '"/>' ELSE '' END
            || CASE WHEN doc_id % 3 = 0
                 THEN '<link rel="canonical" href="https://canon.example/'
                      || CAST(doc_id % 50 AS VARCHAR) || '"/>' ELSE '' END
            || CASE WHEN doc_id % 5 <> 0
                 THEN '<meta charset="utf-8"/>' ELSE '' END
            || '</head><body>' || substr(text, 1, 30) || '</body></html>'
            AS html
          FROM pages)
        SELECT doc_id,
          regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
          regexp_extract(html, '<meta name="description" content="([^"]*)"', 1)
            AS description,
          regexp_extract(html, '<link rel="canonical" href="([^"]*)"', 1)
            AS canonical,
          regexp_extract(html, '<meta charset="([^"]*)"', 1) AS charset
        FROM h"""),

    "web_reciprocity" ->
      """WITH e AS (SELECT DISTINCT src, dst FROM (
           SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
           UNION ALL SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents
           UNION ALL SELECT doc_id % 97, (doc_id * 23 + 11) % 97 FROM documents
           UNION ALL SELECT (doc_id * 31 + 7) % 97, doc_id % 97
             FROM documents WHERE doc_id % 4 = 0)
           WHERE src <> dst),
         r AS (SELECT e.src, e.dst FROM e
               WHERE EXISTS (SELECT 1 FROM e e2
                             WHERE e2.src = e.dst AND e2.dst = e.src))
         SELECT o.host, o.n_out, COALESCE(q.n_recip, 0) AS n_recip
         FROM (SELECT src AS host, COUNT(*) AS n_out FROM e GROUP BY src) o
         LEFT JOIN (SELECT src AS host, COUNT(*) AS n_recip FROM r GROUP BY src) q
           ON o.host = q.host""",

    "web_host_quality" ->
      // the same integer certificate with z²=2401/625, t=1/2: AI ≥ 0 and
      // 4·c·d·tD²·k(n−k) + c²·tD²·n ≤ n·AI², all in HUGEINT
      Pages.sqlWith("""
        , a AS (SELECT 'host' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host,
            COUNT(*) AS n,
            COUNT(CASE WHEN doc_id % 4 <> 0 THEN 1 END) AS k
          FROM pages GROUP BY 1),
        w AS (SELECT host, n, k,
            CAST(2500 AS HUGEINT) * k + 4802
              - CAST(2 AS HUGEINT) * (625 * n + 2401) AS ai
          FROM a)
        SELECT host, n, k,
          (ai >= 0 AND
           CAST(24010000 AS HUGEINT) * k * (n - k)
             + CAST(23059204 AS HUGEINT) * n
             <= CAST(n AS HUGEINT) * ai * ai) AS pass
        FROM w"""),

    "web_kcore" -> {
      // unrolled simultaneous peeling: each round recomputes degrees and
      // keeps edges whose BOTH endpoints clear k; 4 rounds cover the
      // fixture's 2 live rounds with margin (simultaneous peeling is
      // order-free, so converged prefixes are stable)
      def round(i: Int): String =
        s""", d$i AS (SELECT node, COUNT(*) AS deg FROM (
               SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
             GROUP BY node),
           e$i AS (SELECT u, v FROM e${i - 1}
                   WHERE u NOT IN (SELECT node FROM d$i WHERE deg < 5)
                     AND v NOT IN (SELECT node FROM d$i WHERE deg < 5))"""
      s"""WITH raw AS (
           SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
           UNION ALL SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents
           UNION ALL SELECT doc_id % 97, (doc_id * 23 + 11) % 97 FROM documents),
         e0 AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
                FROM raw WHERE src <> dst)
         ${(1 to 4).map(round).mkString("\n")}
         SELECT node, COUNT(*) AS deg FROM (
           SELECT u AS node FROM e4 UNION ALL SELECT v FROM e4)
         GROUP BY node"""
    },

    "web_components" ->
      // symmetric-edge transitive closure with a min-per-component
      // reduction — identical connectivity to the engine's star
      // contraction, therefore identical components
      """WITH RECURSIVE raw AS (
           SELECT doc_id % 997 AS src, (doc_id * 31 + 7) % 997 AS dst FROM documents
           UNION ALL SELECT doc_id % 997, (doc_id * 17 + 3) % 997 FROM documents),
         edges AS (SELECT DISTINCT u, v FROM (
           SELECT src AS u, dst AS v FROM raw WHERE src <> dst
           UNION ALL SELECT dst, src FROM raw WHERE src <> dst)),
         reach(src, dst) AS (
           SELECT u, u FROM (SELECT DISTINCT u FROM edges)
           UNION
           SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst)
         SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src""",

    "web_triangles" ->
      // replay the canonicalize → degree → orient → wedge-join → close
      // pipeline; the (ddeg, dst) lexicographic wedge order and the
      // deg_a <= deg_b orientation tie-break mirror the Scala exactly
      """WITH raw AS (
           SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
           UNION ALL SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents
           UNION ALL SELECT doc_id % 97, (doc_id * 23 + 11) % 97 FROM documents),
         und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                 FROM raw WHERE src <> dst),
         deg AS (SELECT node, COUNT(*) AS deg FROM (
                   SELECT a AS node FROM und UNION ALL SELECT b FROM und)
                 GROUP BY node),
         o AS (SELECT CASE WHEN da.deg <= db.deg THEN u.a ELSE u.b END AS src,
                      CASE WHEN da.deg <= db.deg THEN u.b ELSE u.a END AS dst,
                      CASE WHEN da.deg <= db.deg THEN db.deg ELSE da.deg END AS ddeg
               FROM und u JOIN deg da ON u.a = da.node
                          JOIN deg db ON u.b = db.node),
         tri AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
                 FROM o e1 JOIN o e2 ON e1.src = e2.src
                   AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
                 JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
         cnt AS (SELECT node, COUNT(*) AS n_tri FROM (
                   SELECT x AS node FROM tri
                   UNION ALL SELECT y FROM tri
                   UNION ALL SELECT z FROM tri)
                 GROUP BY node)
         SELECT d.node, d.deg, COALESCE(c.n_tri, 0) AS n_tri
         FROM deg d LEFT JOIN cnt c ON d.node = c.node""",

    "web_boilerplate" ->
      // rebuild the same boilerplated text, replay the per-(host, line)
      // document frequency and the integer cross-multiplied threshold
      // (n_docs*2 >= n_host_docs*1, hosts with >= 2 pages), then
      // reassemble survivors in document order (pos is 0-based in Spark's
      // posexplode, 1-based in generate_subscripts — hence pos - 1;
      // string_agg over zero survivors is NULL — hence the COALESCE,
      // matching Spark's array_join over an empty array)
      Pages.sqlWith("""
        , p AS (SELECT doc_id,
            'host' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host,
            '(c) host' || CAST(doc_id % 97 AS VARCHAR) || ' header' || chr(10) ||
            'body ' || CAST(doc_id AS VARCHAR) || chr(10) ||
            CASE WHEN doc_id % 2 = 0 THEN 'promo line' || chr(10) ELSE '' END ||
            substr(text, 1, 40) || chr(10) || 'footer common' AS t
          FROM pages),
        lns AS (SELECT doc_id, host,
            generate_subscripts(string_split(t, chr(10)), 1) - 1 AS pos,
            unnest(string_split(t, chr(10))) AS line FROM p),
        hd AS (SELECT host, COUNT(*) AS n_host_docs FROM p GROUP BY host),
        lf AS (SELECT host, line, COUNT(DISTINCT doc_id) AS n_docs
               FROM lns GROUP BY host, line),
        boiler AS (SELECT lf.host, lf.line FROM lf JOIN hd ON lf.host = hd.host
                   WHERE lf.n_docs * 2 >= hd.n_host_docs * 1
                     AND hd.n_host_docs >= 2),
        flag AS (SELECT l.doc_id, l.host, l.pos, l.line,
                   b.line IS NOT NULL AS is_b
                 FROM lns l LEFT JOIN boiler b
                   ON l.host = b.host AND l.line = b.line)
        SELECT doc_id, host,
          COALESCE(string_agg(CASE WHEN NOT is_b THEN line END,
                              chr(10) ORDER BY pos), '') AS clean_text,
          COUNT(CASE WHEN NOT is_b THEN 1 END) AS n_kept,
          COUNT(CASE WHEN is_b THEN 1 END) AS n_dropped
        FROM flag GROUP BY doc_id, host"""),

    "web_trustrank" -> webTrustrankOracle,
    // both unrolled chains nested verbatim; the mass fold is the
    // engine's sign-explicit integer ppm
    "web_spam_mass" ->
      s"""WITH pr AS (SELECT host, rank AS pr FROM ($webPagerankOracle)),
        tr AS (SELECT host, rank AS tr FROM ($webTrustrankOracle))
        SELECT pr.host, pr.pr, tr.tr,
          CAST(CASE WHEN pr.pr = 0 THEN 0
               WHEN pr.pr >= tr.tr THEN (pr.pr - tr.tr) * 1000000 // pr.pr
               ELSE -((tr.tr - pr.pr) * 1000000 // pr.pr)
               END AS BIGINT) AS smass_ppm
        FROM pr JOIN tr USING (host)""",

    "web_spamrank" -> {
      // trustRank's unrolled CTE chain over the REVERSED edge set
      // (src/dst swapped at the source), spam seeds = hosts % 11 = 0,
      // 4 iterations — identical integer fixed-point arithmetic
      val scale = 1000000000000L
      def iter(k: Int): String =
        s""", dang$k AS (
             SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS d
             FROM r${k - 1} WHERE host NOT IN (SELECT src FROM edges)),
           r$k AS (
             SELECT n.host,
                    (CASE WHEN s.host IS NOT NULL
                      THEN (($scale * 3) // (20 * (SELECT cnt FROM sn)))
                         + (((SELECT d FROM dang$k) * 17) // (20 * (SELECT cnt FROM sn)))
                      ELSE 0 END)
                  + COALESCE(c.contrib, 0) AS rank
             FROM nodes n
             LEFT JOIN seeds s ON n.host = s.host
             LEFT JOIN (
               SELECT e.dst AS host,
                      CAST(SUM((r.rank * 17) // (20 * dg.deg)) AS BIGINT) AS contrib
               FROM r${k - 1} r
               JOIN edges e ON r.host = e.src
               JOIN deg dg ON dg.src = e.src
               GROUP BY e.dst) c ON n.host = c.host)"""
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT (doc_id * 31 + 7) % 97 AS src, doc_id % 97 AS dst FROM documents
             UNION ALL
             SELECT (doc_id * 17 + 3) % 97, doc_id % 97 FROM documents)
           WHERE src <> dst),
         nodes AS (
           SELECT DISTINCT host FROM (
             SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         seeds AS (SELECT host FROM nodes WHERE host % 11 = 0),
         sn AS (SELECT COUNT(*) AS cnt FROM seeds),
         deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         r0 AS (
           SELECT n.host,
                  CASE WHEN s.host IS NOT NULL
                       THEN $scale // (SELECT cnt FROM sn) ELSE 0 END AS rank
           FROM nodes n LEFT JOIN seeds s ON n.host = s.host)
         ${(1 to 4).map(iter).mkString("\n")}
         SELECT host, rank FROM r4"""
    },

    "web_lpa" -> {
      // three unrolled synchronous LPA rounds: per-(node, label) neighbor
      // counts + argmax with (cnt DESC, label ASC) — the engine's
      // max-of-struct tie-break, window form in SQL
      def round(k: Int): String =
        s""", c$k AS (SELECT e.src AS host, l.label, CAST(count(*) AS BIGINT) AS cnt
             FROM sym e JOIN l${k - 1} l ON l.host = e.dst GROUP BY 1, 2),
           l$k AS (SELECT host, label FROM (
             SELECT host, label,
               row_number() OVER (PARTITION BY host ORDER BY cnt DESC, label) AS rn
             FROM c$k) WHERE rn = 1)"""
      s"""WITH raw AS (
           SELECT doc_id % 997 AS src, (doc_id * 31 + 7) % 997 AS dst FROM documents
           UNION ALL SELECT doc_id % 997, (doc_id * 17 + 3) % 997 FROM documents),
         sym AS (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM raw WHERE src <> dst
           UNION ALL SELECT dst, src FROM raw WHERE src <> dst)),
         l0 AS (SELECT DISTINCT src AS host, src AS label FROM sym)
         ${(1 to 3).map(round).mkString("\n")}
         SELECT host, label AS community FROM l3"""
    },

    "web_modularity" -> {
      // the web_lpa round chain + the exact integer modularity fold:
      // Qnum = 2m·Σe2_c − Σd_c², q_ppm sign-explicit truncation
      def round(k: Int): String =
        s""", c$k AS (SELECT e.src AS host, l.label, CAST(count(*) AS BIGINT) AS cnt
             FROM sym e JOIN l${k - 1} l ON l.host = e.dst GROUP BY 1, 2),
           l$k AS (SELECT host, label FROM (
             SELECT host, label,
               row_number() OVER (PARTITION BY host ORDER BY cnt DESC, label) AS rn
             FROM c$k) WHERE rn = 1)"""
      s"""WITH raw AS (
           SELECT doc_id % 997 AS src, (doc_id * 31 + 7) % 997 AS dst FROM documents
           UNION ALL SELECT doc_id % 997, (doc_id * 17 + 3) % 997 FROM documents),
         sym AS (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM raw WHERE src <> dst
           UNION ALL SELECT dst, src FROM raw WHERE src <> dst)),
         l0 AS (SELECT DISTINCT src AS host, src AS label FROM sym)
         ${(1 to 3).map(round).mkString("\n")},
         labpairs AS (SELECT ls.label AS cs, ld.label AS cd
           FROM sym e JOIN l3 ls ON ls.host = e.src JOIN l3 ld ON ld.host = e.dst),
         perc AS (SELECT cs AS community, CAST(count(*) AS BIGINT) AS d_c,
             CAST(sum(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS BIGINT) AS e2_c
           FROM labpairs GROUP BY cs),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
             CAST(sum(d_c) AS BIGINT) AS two_m,
             CAST(sum(e2_c) AS BIGINT) AS e2_sum,
             CAST(sum(d_c * d_c) AS BIGINT) AS d2_sum
           FROM perc)
         SELECT n_communities, two_m, e2_sum, d2_sum,
           CAST(two_m * e2_sum - d2_sum AS BIGINT) AS q_num,
           CAST(CASE WHEN two_m * e2_sum - d2_sum >= 0
             THEN (two_m * e2_sum - d2_sum) * 1000000 // (two_m * two_m)
             ELSE -((d2_sum - two_m * e2_sum) * 1000000 // (two_m * two_m))
             END AS BIGINT) AS q_ppm
         FROM tot"""
    },
    "web_bowtie" -> {
      // two 8-round min-hop relaxation chains (fk forward over edges,
      // bk backward over reversed edges) + the classifying CASE
      def iter(t: String, src: String, dst: String)(k: Int): String =
        s""", $t$k AS (
             SELECT host, CAST(MIN(hops) AS INT) AS hops FROM (
               SELECT host, hops FROM $t${k - 1}
               UNION ALL
               SELECT e.$dst AS host, r.hops + 1 AS hops
               FROM $t${k - 1} r JOIN edges e ON r.host = e.$src)
             GROUP BY host)"""
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         nodes AS (
           SELECT DISTINCT host FROM (
             SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         f0 AS (SELECT host, CAST(0 AS INT) AS hops FROM nodes WHERE host % 29 = 0),
         b0 AS (SELECT host, CAST(0 AS INT) AS hops FROM nodes WHERE host % 29 = 0)
         ${(1 to 8).map(iter("f", "src", "dst")).mkString("\n")}
         ${(1 to 8).map(iter("b", "dst", "src")).mkString("\n")}
         SELECT n.host, f.hops AS hops_fwd, b.hops AS hops_bwd,
           CASE WHEN f.host IS NOT NULL AND b.host IS NOT NULL THEN 'core'
                WHEN b.host IS NOT NULL THEN 'in'
                WHEN f.host IS NOT NULL THEN 'out'
                ELSE 'other' END AS klass
         FROM nodes n
         LEFT JOIN f8 f ON f.host = n.host
         LEFT JOIN b8 b ON b.host = n.host"""
    },

    "web_assortativity" ->
      """WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS j FROM edges GROUP BY src),
         id_ AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS k FROM edges GROUP BY dst),
         jk AS (SELECT od.j, id_.k FROM edges e
                JOIN od ON od.src = e.src JOIN id_ ON id_.dst = e.dst),
         m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(j) AS BIGINT) AS sj, CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(j * k) AS BIGINT) AS sjk,
                 CAST(SUM(j * j) AS BIGINT) AS sj2,
                 CAST(SUM(k * k) AS BIGINT) AS sk2 FROM jk),
         c AS (SELECT m, sj, sk, sjk, sj2, sk2,
                 CAST(m AS HUGEINT) * sjk - CAST(sj AS HUGEINT) * sk AS numd,
                 CAST(m AS HUGEINT) * sj2 - CAST(sj AS HUGEINT) * sj AS denjd,
                 CAST(m AS HUGEINT) * sk2 - CAST(sk AS HUGEINT) * sk AS denkd FROM m)
        SELECT m, sj, sk, sjk, sj2, sk2,
          CAST(numd AS BIGINT) AS num,
          CAST(denjd AS BIGINT) AS den_j, CAST(denkd AS BIGINT) AS den_k,
          CASE WHEN denjd <= 0 OR denkd <= 0 THEN 0
               ELSE (CASE WHEN numd < 0 THEN -1 ELSE 1 END)
                 * CAST((numd * numd * 1000000) // (denjd * denkd) AS BIGINT)
          END AS r2_ppm
        FROM c""",

    "web_reach" -> {
      // 6-round min-hop relaxation over the same edge fixture; BFS and
      // relaxation agree exactly on shortest hop counts
      def iter(k: Int): String =
        s""", r$k AS (
             SELECT host, CAST(MIN(hops) AS INT) AS hops FROM (
               SELECT host, hops FROM r${k - 1}
               UNION ALL
               SELECT e.dst AS host, r.hops + 1 AS hops
               FROM r${k - 1} r JOIN edges e ON r.host = e.src)
             GROUP BY host)"""
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         r0 AS (SELECT CAST(0 AS BIGINT) AS host, CAST(0 AS INT) AS hops)
         ${(1 to 6).map(iter).mkString("\n")}
         SELECT host, hops FROM r6"""
    },

    "web_hits" ->
      // two unrolled alternating-walk-count rounds on the same edge
      // fixture; hub_1 = outdegree (auth_0 = 1 everywhere), every SUM
      // cast back down (DuckDB widens to HUGEINT, Spark stays
      // decimal(38,0) — both fit BIGINT on this fixture)
      """WITH e AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         nodes AS (
           SELECT DISTINCT node FROM (
             SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         h1 AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS hub
                FROM e GROUP BY src),
         a1 AS (SELECT e.dst AS node, CAST(SUM(h1.hub) AS BIGINT) AS auth
                FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
         h2 AS (SELECT e.src AS node, CAST(SUM(a1.auth) AS BIGINT) AS hub
                FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
         a2 AS (SELECT e.dst AS node, CAST(SUM(h2.hub) AS BIGINT) AS auth
                FROM e JOIN h2 ON e.src = h2.node GROUP BY e.dst)
         SELECT n.node, COALESCE(h2.hub, 0) AS hub, COALESCE(a2.auth, 0) AS auth
         FROM nodes n
         LEFT JOIN h2 ON n.node = h2.node
         LEFT JOIN a2 ON n.node = a2.node""",

    "text_lm_score" ->
      // reference counts over doc_id % 10 = 0, row_number adjacency for
      // bigrams, the same two-branch integer score with HUGEINT
      // intermediates and // floor division
      """WITH l AS (SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id, pos, tok FROM l WHERE tok <> ''),
         seq AS (SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p, tok
           FROM f),
         runi AS (SELECT tok, COUNT(*) AS cw FROM f
                  WHERE doc_id % 10 = 0 GROUP BY tok),
         tot AS (SELECT SUM(cw) AS n FROM runi),
         rbi AS (SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS cxy
                 FROM seq a JOIN seq b
                   ON a.doc_id = b.doc_id AND b.p = a.p + 1
                 WHERE a.doc_id % 10 = 0
                 GROUP BY 1, 2),
         dbi AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
                 FROM seq a JOIN seq b
                   ON a.doc_id = b.doc_id AND b.p = a.p + 1),
         sc AS (SELECT d.doc_id,
             CASE WHEN rb.cxy IS NOT NULL
               THEN CAST((CAST(rb.cxy AS HUGEINT) * 1000000000)
                         // up.cw AS BIGINT)
               ELSE CAST((CAST(COALESCE(uw.cw, 0) AS HUGEINT) * 400000000)
                         // (SELECT n FROM tot) AS BIGINT) END AS s
           FROM dbi d
           LEFT JOIN rbi rb ON d.w1 = rb.w1 AND d.w2 = rb.w2
           LEFT JOIN runi up ON d.w1 = up.tok
           LEFT JOIN runi uw ON d.w2 = uw.tok),
         agg AS (SELECT doc_id, COUNT(*) AS n_big, SUM(s) AS score
                 FROM sc GROUP BY doc_id)
         SELECT d.doc_id, COALESCE(a.n_big, 0) AS n_big,
           CAST(COALESCE(a.score, 0) AS BIGINT) AS score
         FROM (SELECT DISTINCT doc_id FROM documents) d
         LEFT JOIN agg a ON d.doc_id = a.doc_id""",

    "text_soundex" ->
      s"""WITH n AS (SELECT * FROM (VALUES $soundexNamesSql) AS t(name_id, name))
        SELECT name_id, name, ${TextOps.soundexSql("name")} AS key FROM n""",

    "text_soundex_pairs" ->
      s"""WITH n AS (SELECT * FROM (VALUES $soundexNamesSql) AS t(name_id, name)),
         k AS (SELECT name_id, name, ${TextOps.soundexSql("name")} AS key FROM n)
        SELECT a.key, a.name_id AS id_a, a.name AS name_a,
               b.name_id AS id_b, b.name AS name_b
        FROM k a JOIN k b ON a.key = b.key AND a.name_id < b.name_id""",

    "text_heavy_mg" ->
      """WITH l AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT tok FROM l WHERE tok <> ''),
         tot AS (SELECT count(*) AS total FROM f)
        SELECT tok AS key, CAST(count(*) AS BIGINT) AS cnt,
          (SELECT total FROM tot) AS total
        FROM f GROUP BY tok
        HAVING count(*) * 31 > (SELECT total FROM tot)""",

    "url_idn" -> """SELECT * FROM (VALUES
      (0, 'xn--mnchen-3ya.de', 'münchen.de', 'xn--mnchen-3ya.de'),
      (1, 'xn--bcher-kva.example', 'bücher.example', 'xn--bcher-kva.example'),
      (2, 'xn--fiqs8s', '中国', 'xn--fiqs8s'),
      (3, 'www.example.com', 'www.example.com', 'www.example.com'),
      (4, 'XN--MNCHEN-3YA.DE', 'münchen.de', 'xn--mnchen-3ya.de'),
      (5, 'xn--80akhbyknj4f.example', 'испытание.example', 'xn--80akhbyknj4f.example'),
      (6, 'mixed.xn--caf-dma.shop', 'mixed.café.shop', 'mixed.xn--caf-dma.shop'),
      (7, 'xn--nxasmq6b.example', 'βόλοσ.example', 'xn--nxasmq6b.example'))
      AS t("host_id", "host", "display", "ace")""",

    "url_ring" -> Pages.sqlWith(
      """, ring AS (SELECT t.s, u.r,
           CAST('0x' || substr(md5('ring:' || CAST(t.s AS VARCHAR) || ':'
                || CAST(u.r AS VARCHAR)), 1, 15) AS BIGINT) AS h
         FROM (SELECT unnest(range(11)) AS s) t
         CROSS JOIN (SELECT unnest(range(8)) AS r) u),
       kh AS (SELECT url, CAST('0x' || substr(md5(url), 1, 15) AS BIGINT) AS h
         FROM pages),
       a10 AS (SELECT k.url, coalesce(
           (SELECT r2.s FROM ring r2 WHERE r2.s < 10 AND r2.h >= k.h
            ORDER BY r2.h, r2.s LIMIT 1),
           (SELECT r3.s FROM ring r3 WHERE r3.s < 10
            ORDER BY r3.h, r3.s LIMIT 1)) AS shard FROM kh k),
       a11 AS (SELECT k.url, coalesce(
           (SELECT r2.s FROM ring r2 WHERE r2.h >= k.h
            ORDER BY r2.h, r2.s LIMIT 1),
           (SELECT r3.s FROM ring r3 ORDER BY r3.h, r3.s LIMIT 1)) AS s_to
         FROM kh k)
      SELECT CAST(a10.shard AS INT) AS shard, CAST(count(*) AS BIGINT) AS n_keys,
        CAST(sum(CASE WHEN a11.s_to <> a10.shard THEN 1 ELSE 0 END) AS BIGINT)
          AS n_moved,
        min(a10.url) AS min_key
      FROM a10 JOIN a11 USING (url) GROUP BY a10.shard"""),

    "events_gap_quantiles" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
           FROM events),
         g AS (SELECT event_type,
             (us - lag(us) OVER (PARTITION BY user_id, event_type
                                 ORDER BY us, event_id)) // 1000000 AS gap_s
           FROM e),
         f AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
         h AS (SELECT event_type, gap_s, count(*) AS c FROM f GROUP BY 1, 2),
         cum AS (SELECT event_type, gap_s, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY gap_s) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n FROM h)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
          min(gap_s) AS min_gap,
          min(CASE WHEN cum * 100 >= n * 50 THEN gap_s END) AS p50,
          min(CASE WHEN cum * 100 >= n * 90 THEN gap_s END) AS p90,
          min(CASE WHEN cum * 100 >= n * 99 THEN gap_s END) AS p99,
          max(gap_s) AS max_gap
        FROM cum GROUP BY event_type""",

    "url_shards" -> Pages.sqlWith(
      """, sh AS (SELECT unnest(range(11)) AS s),
         h AS (SELECT p.url, sh.s,
             CAST('0x' || substr(md5(p.url || '#' || CAST(sh.s AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
           FROM pages p CROSS JOIN sh),
         a10 AS (SELECT url, s FROM (SELECT url, s,
             row_number() OVER (PARTITION BY url ORDER BY h DESC, s DESC) AS rn
           FROM h WHERE s < 10) WHERE rn = 1),
         a11 AS (SELECT url, s AS s_to FROM (SELECT url, s,
             row_number() OVER (PARTITION BY url ORDER BY h DESC, s DESC) AS rn
           FROM h) WHERE rn = 1)
        SELECT CAST(a10.s AS INT) AS shard, CAST(count(*) AS BIGINT) AS n_keys,
          CAST(sum(CASE WHEN a11.s_to <> a10.s THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
          min(a10.url) AS min_key
        FROM a10 JOIN a11 USING (url) GROUP BY a10.s"""),

    "text_cms" ->
      // one UNION ALL branch per depth row, each replaying the seeded
      // md5prefix bucket (d ':' tok, top 60 bits, % width)
      """WITH l AS (SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT tok FROM l WHERE tok <> ''),
         u AS (
           SELECT CAST(0 AS INT) AS d,
             CAST('0x' || substr(md5('0:' || tok), 1, 15) AS BIGINT) % 256 AS b FROM f
           UNION ALL SELECT CAST(1 AS INT),
             CAST('0x' || substr(md5('1:' || tok), 1, 15) AS BIGINT) % 256 FROM f
           UNION ALL SELECT CAST(2 AS INT),
             CAST('0x' || substr(md5('2:' || tok), 1, 15) AS BIGINT) % 256 FROM f
           UNION ALL SELECT CAST(3 AS INT),
             CAST('0x' || substr(md5('3:' || tok), 1, 15) AS BIGINT) % 256 FROM f)
         SELECT d, b, COUNT(*) AS cnt FROM u GROUP BY d, b""",

    "text_cms_probe" ->
      """WITH l AS (SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT tok FROM l WHERE tok <> ''),
         u AS (
           SELECT CAST(0 AS INT) AS d,
             CAST('0x' || substr(md5('0:' || tok), 1, 15) AS BIGINT) % 256 AS b FROM f
           UNION ALL SELECT CAST(1 AS INT),
             CAST('0x' || substr(md5('1:' || tok), 1, 15) AS BIGINT) % 256 FROM f
           UNION ALL SELECT CAST(2 AS INT),
             CAST('0x' || substr(md5('2:' || tok), 1, 15) AS BIGINT) % 256 FROM f
           UNION ALL SELECT CAST(3 AS INT),
             CAST('0x' || substr(md5('3:' || tok), 1, 15) AS BIGINT) % 256 FROM f),
         regs AS (SELECT d, b, COUNT(*) AS cnt FROM u GROUP BY d, b),
         probes AS (SELECT DISTINCT tok FROM f),
         pb AS (
           SELECT tok, CAST(0 AS INT) AS d,
             CAST('0x' || substr(md5('0:' || tok), 1, 15) AS BIGINT) % 256 AS b FROM probes
           UNION ALL SELECT tok, CAST(1 AS INT),
             CAST('0x' || substr(md5('1:' || tok), 1, 15) AS BIGINT) % 256 FROM probes
           UNION ALL SELECT tok, CAST(2 AS INT),
             CAST('0x' || substr(md5('2:' || tok), 1, 15) AS BIGINT) % 256 FROM probes
           UNION ALL SELECT tok, CAST(3 AS INT),
             CAST('0x' || substr(md5('3:' || tok), 1, 15) AS BIGINT) % 256 FROM probes),
         est AS (SELECT pb.tok, MIN(COALESCE(r.cnt, 0)) AS est
                 FROM pb LEFT JOIN regs r ON pb.d = r.d AND pb.b = r.b
                 GROUP BY pb.tok),
         x AS (SELECT tok, COUNT(*) AS exact FROM f GROUP BY tok)
         SELECT e.tok, e.est, x.exact FROM est e JOIN x ON e.tok = x.tok""",

    "text_length_quantiles" ->
      // the same histogram + running-sum + integer cross-multiplied
      // threshold; window SUMs are HUGEINT in DuckDB, hence the BIGINT
      // cast on n_docs
      """WITH sized AS (SELECT lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_toks
           FROM documents),
         hist AS (SELECT lang, n_toks, COUNT(*) AS c FROM sized GROUP BY 1, 2),
         cum AS (SELECT lang, n_toks, c,
             SUM(c) OVER (PARTITION BY lang ORDER BY n_toks) AS cum,
             SUM(c) OVER (PARTITION BY lang) AS n
           FROM hist)
         SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
           MIN(n_toks) AS min_toks,
           MIN(CASE WHEN cum * 100 >= n * 50 THEN n_toks END) AS p50,
           MIN(CASE WHEN cum * 100 >= n * 90 THEN n_toks END) AS p90,
           MIN(CASE WHEN cum * 100 >= n * 99 THEN n_toks END) AS p99,
           MAX(n_toks) AS max_toks
         FROM cum GROUP BY lang""",

    "events_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (SELECT *,
             max(CASE WHEN event_type = 'click' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_touch_us,
             min(CASE WHEN event_type = 'click' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
               AS first_touch_us
           FROM e)
        SELECT event_id, user_id, us AS conv_us, value_cents, last_touch_us,
          first_touch_us, last_touch_us IS NOT NULL AS attributed
        FROM w WHERE event_type = 'purchase'""",

    "quality_drift" ->
      """WITH b AS (SELECT n_chars - (n_chars % 16) AS bucket,
             doc_id % 2 AS cohort FROM documents),
         g AS (SELECT bucket,
             sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN cohort <> 0 THEN 1 ELSE 0 END) AS n_b
           FROM b GROUP BY bucket),
         t AS (SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM g),
         c AS (SELECT g.bucket, g.n_a, g.n_b,
             abs(CAST(g.n_a AS HUGEINT) * t.tot_b
                 - CAST(g.n_b AS HUGEINT) * t.tot_a) AS imbalance,
             t.tot_a, t.tot_b
           FROM g CROSS JOIN t),
         tv AS (SELECT CAST(sum(imbalance) * 1000000
               // (2 * CAST(max(tot_a) AS HUGEINT) * max(tot_b)) AS BIGINT)
             AS tv_ppm FROM c)
        SELECT c.bucket, CAST(c.n_a AS BIGINT) AS n_a,
          CAST(c.n_b AS BIGINT) AS n_b,
          CAST(c.imbalance AS BIGINT) AS imbalance, tv.tv_ppm
        FROM c CROSS JOIN tv""",

    "events_funnel" ->
      // the same per-step min-reach-time chain; epoch_us is DuckDB's
      // unix_micros twin, // the same floor division on the ppm
      """WITH b AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         r1 AS (SELECT user_id, MIN(us) AS t FROM b
                WHERE event_type = 'view' GROUP BY user_id),
         r2 AS (SELECT b.user_id, MIN(b.us) AS t FROM b
                JOIN r1 ON b.user_id = r1.user_id
                WHERE b.event_type = 'click' AND b.us >= r1.t
                GROUP BY b.user_id),
         r3 AS (SELECT b.user_id, MIN(b.us) AS t FROM b
                JOIN r2 ON b.user_id = r2.user_id
                WHERE b.event_type = 'purchase' AND b.us >= r2.t
                GROUP BY b.user_id)
         SELECT CAST(1 AS INT) AS step_no, 'view' AS step,
           CAST((SELECT COUNT(*) FROM r1) AS BIGINT) AS n_users,
           CAST(1000000 AS BIGINT) AS conv_ppm
         UNION ALL SELECT CAST(2 AS INT), 'click',
           CAST((SELECT COUNT(*) FROM r2) AS BIGINT),
           CAST((SELECT COUNT(*) FROM r2) * 1000000
                // (SELECT COUNT(*) FROM r1) AS BIGINT)
         UNION ALL SELECT CAST(3 AS INT), 'purchase',
           CAST((SELECT COUNT(*) FROM r3) AS BIGINT),
           CAST((SELECT COUNT(*) FROM r3) * 1000000
                // (SELECT COUNT(*) FROM r2) AS BIGINT)""",

    "text_keyphrases" ->
      // replay the stopword→chr(30) marking, phrase split/trim, the
      // occurrence-level (freq, deg) stats, per-word truncating ppm
      // ratio, and the distinct-phrase score sum + rank
      """WITH marked AS (SELECT doc_id,
           array_to_string(list_transform(
             list_filter(string_split(text, ' '), t -> t <> ''),
             t -> CASE WHEN t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is')
                  THEN chr(30) ELSE t END), ' ') AS m
         FROM documents),
        ph AS (SELECT doc_id, p AS phrase FROM (
           SELECT doc_id, unnest(list_transform(string_split(m, chr(30)),
             s -> trim(s))) AS p FROM marked) WHERE p <> ''),
        words AS (SELECT doc_id, phrase,
           len(string_split(phrase, ' ')) AS plen,
           unnest(string_split(phrase, ' ')) AS word FROM ph),
        stats AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(plen) AS BIGINT) AS deg FROM words GROUP BY 1, 2),
        rat AS (SELECT doc_id, word, deg * 1000000 // freq AS ratio_ppm FROM stats),
        dph AS (SELECT DISTINCT doc_id, phrase FROM ph),
        pw AS (SELECT doc_id, phrase,
           unnest(string_split(phrase, ' ')) AS word FROM dph),
        sc AS (SELECT pw.doc_id, pw.phrase, CAST(sum(r.ratio_ppm) AS BIGINT) AS score_ppm
           FROM pw JOIN rat r ON r.doc_id = pw.doc_id AND r.word = pw.word
           GROUP BY 1, 2),
        rk AS (SELECT doc_id, phrase, score_ppm,
           row_number() OVER (PARTITION BY doc_id
             ORDER BY score_ppm DESC, phrase) AS rank FROM sc)
        SELECT doc_id, phrase, score_ppm, CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 3""",

    "text_collocations" ->
      // adjacency via row_number over surviving (non-empty) tokens —
      // the SQL twin of Spark's filtered token array; HUGEINT keeps the
      // c_xy·N·10⁹ product exact, // is the same floor division as div
      """WITH l AS (SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id, pos, tok FROM l WHERE tok <> ''),
         seq AS (SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p, tok
           FROM f),
         uni AS (SELECT tok, COUNT(*) AS c FROM f GROUP BY tok),
         tot AS (SELECT SUM(c) AS n FROM uni),
         bi AS (SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS cxy
                FROM seq a JOIN seq b
                  ON a.doc_id = b.doc_id AND b.p = a.p + 1
                GROUP BY 1, 2 HAVING COUNT(*) >= 5)
         SELECT w1, w2, cxy, ux.c AS cx, uy.c AS cy,
           CAST((CAST(cxy AS HUGEINT) * (SELECT n FROM tot) * 1000000000)
                // (CAST(ux.c AS HUGEINT) * uy.c) AS BIGINT) AS score
         FROM bi JOIN uni ux ON bi.w1 = ux.tok
                 JOIN uni uy ON bi.w2 = uy.tok
         ORDER BY score DESC, w1, w2 LIMIT 50""",

    "text_pack" ->
      // naive global-window form — identical to the engine's bucketed
      // prefix sum by associativity
      """WITH sized AS (SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         FROM documents),
        c AS (SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
         FROM sized WHERE n_tokens > 0)
        SELECT doc_id, n_tokens, tok_start,
          CAST(tok_start // 512 AS BIGINT) AS win_start,
          CAST((tok_start + n_tokens - 1) // 512 AS BIGINT) AS win_end,
          CAST(((tok_start + n_tokens - 1) // 512) - (tok_start // 512) + 1 AS BIGINT) AS n_windows
        FROM c""",

    "text_pii" ->
      """WITH planted AS (SELECT doc_id, text
           || CASE WHEN doc_id % 5 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example now'
                ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                THEN ' tel 9' || CAST(doc_id + 100000000 AS VARCHAR) ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
           AS text FROM documents),
        s AS (SELECT doc_id, text,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<email>', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<ip>', 'g'),
             '[0-9]{9,}', '<num>', 'g') AS scrub
         FROM planted)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
          CAST(len(regexp_extract_all(text, '[0-9]{9,}')) AS BIGINT) AS n_longnum,
          md5(scrub) AS scrub_md5,
          (len(regexp_extract_all(scrub, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) = 0
            AND len(regexp_extract_all(scrub, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) = 0
            AND len(regexp_extract_all(scrub, '[0-9]{9,}')) = 0) AS clean
        FROM s""",

    "text_normalize" ->
      """SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(
             '  ' || regexp_replace(text, ' ', '  ', 'g') || chr(9),
             '[\t\n\r\f\x0B]', ' ', 'g'), ' +', ' ', 'g'))) AS clean_md5,
           trim(regexp_replace(regexp_replace(
             '  ' || regexp_replace(text, ' ', '  ', 'g') || chr(9),
             '[\t\n\r\f\x0B]', ' ', 'g'), ' +', ' ', 'g')) = text AS ok
         FROM documents""",

    "text_identity" -> Pages.sqlWith(
      "SELECT url, md5(text) AS text_md5 FROM pages"),

    "dedup_exact" ->
      """SELECT md5(text) AS text_md5, CAST(count(*) AS BIGINT) AS n_docs,
         min(doc_id) AS canonical FROM documents GROUP BY 1""",

    "dedup_minhash_sig" -> (sqlToks + ", " + sqlMinhashSig(8) +
      " SELECT * FROM sig"),

    "dedup_lsh_pairs" -> (sqlToks + ", " + sqlMinhashSig(8) +
      """, bands AS (
          SELECT doc_id, 0 AS band, md5(s1 || s2) AS key FROM sig UNION ALL
          SELECT doc_id, 1, md5(s3 || s4) FROM sig UNION ALL
          SELECT doc_id, 2, md5(s5 || s6) FROM sig UNION ALL
          SELECT doc_id, 3, md5(s7 || s8) FROM sig),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id <> b.doc_id
          WHERE a.doc_id % 10 = 0),
        inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c
          JOIN dtoks ta ON ta.doc_id = c.doc_a
          JOIN dtoks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
          GROUP BY 1, 2)
        SELECT c.doc_a, c.doc_b, CAST(COALESCE(i.i, 0) AS BIGINT) AS inter,
          CAST(na.n_toks + nb.n_toks - COALESCE(i.i, 0) AS BIGINT) AS union_n,
          CAST(COALESCE(i.i, 0) AS DOUBLE)
            / CAST(na.n_toks + nb.n_toks - COALESCE(i.i, 0) AS DOUBLE) AS jaccard
        FROM cand c
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes na ON na.doc_id = c.doc_a
        JOIN sizes nb ON nb.doc_id = c.doc_b
        WHERE CAST(COALESCE(i.i, 0) AS DOUBLE)
            / CAST(na.n_toks + nb.n_toks - COALESCE(i.i, 0) AS DOUBLE) >= 0.5"""),

    "dedup_jaccard_pairs" -> (sqlToks +
      """, inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM dtoks a JOIN dtoks b ON a.tok = b.tok AND a.doc_id <> b.doc_id
          WHERE a.doc_id % 10 = 0
          GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS inter,
          CAST(na.n_toks + nb.n_toks - i.i AS BIGINT) AS union_n,
          CAST(i.i AS DOUBLE) / CAST(na.n_toks + nb.n_toks - i.i AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE CAST(i.i AS DOUBLE) / CAST(na.n_toks + nb.n_toks - i.i AS DOUBLE) >= 0.8"""),

    "dedup_cosine_pairs" -> (sqlToks +
      // semantic mirror of the prefix-filtered AllPairs join: plain
      // all-pairs over shared tokens with the same integer weights
      // w = tf * (10^6 // df) and the same exact HUGEINT certificate
      // dot^2 * tDen^2 >= tNum^2 * na2 * nb2 (prefix filtering is
      // lossless, so the outputs coincide row-for-row)
      """, tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
        dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        w AS (SELECT t.doc_id, t.tok, CAST(t.tf * (1000000 // d.df) AS BIGINT) AS w
              FROM tf t JOIN dfr d ON t.tok = d.tok),
        norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS na2 FROM w GROUP BY doc_id),
        dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        CAST(SUM(a.w * b.w) AS BIGINT) AS dot
                 FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id <> b.doc_id
                 WHERE a.doc_id % 10 = 0 AND a.w > 0 AND b.w > 0
                 GROUP BY 1, 2)
        SELECT d.doc_a, d.doc_b, d.dot, na.na2 AS na2, nb.na2 AS nb2
        FROM dots d
        JOIN norms na ON na.doc_id = d.doc_a
        JOIN norms nb ON nb.doc_id = d.doc_b
        WHERE CAST(d.dot AS HUGEINT) * d.dot * 25 >= CAST(na.na2 AS HUGEINT) * nb.na2 * 9"""),

    "dedup_simhash" -> (sqlToks + simhashOracleTail),

    "dedup_simhash_pairs" -> (sqlToks + simhash64PairsOracleTail),

    "dedup_contain_pairs" -> (sqlToks +
      """, inter AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
           FROM dtoks a JOIN dtoks b ON a.tok = b.tok AND a.doc_id <> b.doc_id
           WHERE a.doc_id % 25 = 0
           GROUP BY 1, 2)
         SELECT i.doc_a, i.doc_b, i.inter,
                na.n_toks AS n_a, nb.n_toks AS n_b
         FROM inter i
         JOIN sizes na ON i.doc_a = na.doc_id
         JOIN sizes nb ON i.doc_b = nb.doc_id
         WHERE i.inter * 10 >= 9 * na.n_toks"""),

    "dedup_minhash_shingles" ->
      // 3-gram shingle signature: shingles rebuilt by ranked self-joins
      // (rn+1, rn+2), then the SAME md5prefix min-hash over the gram
      // alphabet — the gram CTE is named dtoks so sqlMinhashSig applies
      ("""WITH occ AS (
           SELECT doc_id,
                  row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
                  tok
           FROM (SELECT doc_id,
                        unnest(string_split(text, ' ')) AS tok,
                        generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents)
           WHERE tok <> ''),
         dtoks AS (SELECT DISTINCT a.doc_id,
                     a.tok || ' ' || b.tok || ' ' || c.tok AS tok
                   FROM occ a
                   JOIN occ b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
                   JOIN occ c ON a.doc_id = c.doc_id AND c.rn = a.rn + 2), """ +
        sqlMinhashSig(8) + " SELECT * FROM sig"),

    "dedup_clusters" ->
      // connected components of the "shares an LSH bucket" relation,
      // computed oracle-side as a recursive transitive closure with a
      // min-per-component reduction (fine at sf0.01; the Spark side uses
      // the O(log n)-round star contraction instead). Edges are ALL
      // bucket-sharing pairs here vs doc→bucket-min stars in the engine
      // — identical connectivity, therefore identical components.
      (sqlToks.replaceFirst("WITH ", "WITH RECURSIVE ") + ", " + sqlMinhashSig(8) +
      """, bands AS (
          SELECT doc_id, 0 AS band, md5(s1 || s2) AS key FROM sig UNION ALL
          SELECT doc_id, 1, md5(s3 || s4) FROM sig UNION ALL
          SELECT doc_id, 2, md5(s5 || s6) FROM sig UNION ALL
          SELECT doc_id, 3, md5(s7 || s8) FROM sig),
        edges AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id <> b.doc_id),
        reach(src, dst) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst),
        comp AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src)
        SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c USING (doc_id)"""),

    "dedup_calibration" ->
      // mirror: md5prefix signatures, the same 4-band md5 keys, canonical
      // candidates, slot-match count vs exact token-set Jaccard, both
      // as truncating integer ppm
      (sqlToks + ", " + sqlMinhashSig(8) +
      """, bands AS (
          SELECT doc_id, 0 AS band, md5(s1 || s2) AS key FROM sig UNION ALL
          SELECT doc_id, 1, md5(s3 || s4) FROM sig UNION ALL
          SELECT doc_id, 2, md5(s5 || s6) FROM sig UNION ALL
          SELECT doc_id, 3, md5(s7 || s8) FROM sig),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        est AS (SELECT c.doc_a, c.doc_b,
            CAST((CASE WHEN a.s1 = b.s1 THEN 1 ELSE 0 END)
               + (CASE WHEN a.s2 = b.s2 THEN 1 ELSE 0 END)
               + (CASE WHEN a.s3 = b.s3 THEN 1 ELSE 0 END)
               + (CASE WHEN a.s4 = b.s4 THEN 1 ELSE 0 END)
               + (CASE WHEN a.s5 = b.s5 THEN 1 ELSE 0 END)
               + (CASE WHEN a.s6 = b.s6 THEN 1 ELSE 0 END)
               + (CASE WHEN a.s7 = b.s7 THEN 1 ELSE 0 END)
               + (CASE WHEN a.s8 = b.s8 THEN 1 ELSE 0 END) AS BIGINT) AS n_match
          FROM cand c JOIN sig a ON a.doc_id = c.doc_a
            JOIN sig b ON b.doc_id = c.doc_b),
        ints AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
          FROM cand c
            JOIN dtoks ta ON ta.doc_id = c.doc_a
            JOIN dtoks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
          GROUP BY 1, 2)
        SELECT e.doc_a, e.doc_b, e.n_match,
          CAST(e.n_match * 1000000 // 8 AS BIGINT) AS est_ppm,
          COALESCE(i.inter, 0) AS inter,
          na.n_toks + nb.n_toks - COALESCE(i.inter, 0) AS union_n,
          CAST(COALESCE(i.inter, 0) * 1000000
               // (na.n_toks + nb.n_toks - COALESCE(i.inter, 0)) AS BIGINT) AS true_ppm
        FROM est e
        LEFT JOIN ints i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
        JOIN sizes na ON na.doc_id = e.doc_a
        JOIN sizes nb ON nb.doc_id = e.doc_b"""),

    "dedup_cluster_keep" ->
      // same component closure + density argmax: keep = first by
      // (density DESC, doc_id ASC) within the cluster — the engine's
      // max-of-struct (density, −doc_id) rule exactly
      (sqlToks.replaceFirst("WITH ", "WITH RECURSIVE ") + ", " + sqlMinhashSig(8) +
      """, bands AS (
          SELECT doc_id, 0 AS band, md5(s1 || s2) AS key FROM sig UNION ALL
          SELECT doc_id, 1, md5(s3 || s4) FROM sig UNION ALL
          SELECT doc_id, 2, md5(s5 || s6) FROM sig UNION ALL
          SELECT doc_id, 3, md5(s7 || s8) FROM sig),
        edges AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id <> b.doc_id),
        reach(src, dst) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst),
        comp AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src),
        cl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
               FROM documents d LEFT JOIN comp c USING (doc_id)),
        dens AS (SELECT d.doc_id,
           CAST(COALESCE(tc.n_tokens, 0) AS DOUBLE) / (CAST(length(d.text) AS DOUBLE) + 1.0) AS density
         FROM documents d LEFT JOIN
           (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id) tc USING (doc_id))
        SELECT cl.doc_id, cl.cluster, dens.density,
          cl.doc_id = first_value(cl.doc_id) OVER (PARTITION BY cl.cluster
            ORDER BY dens.density DESC, cl.doc_id ASC) AS keep
        FROM cl JOIN dens USING (doc_id)"""),

    "dedup_bloom" ->
      // bitmap OR = set union: "all k bits set" ≡ "all k positions in the
      // distinct reference position set" — the engine's bitmap probe and
      // this set-join see identical deterministic md5 positions, so even
      // Bloom false positives reproduce exactly
      """WITH pos AS (SELECT doc_id,
           (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || text), 1, 15)
             AS BIGINT) % 1048576) AS p
         FROM documents, range(1, 6) r(i)),
        refbits AS (SELECT DISTINCT p FROM pos WHERE doc_id % 3 = 0),
        probe AS (SELECT d.doc_id, count(r.p) AS n_set
          FROM pos d LEFT JOIN refbits r ON r.p = d.p
          GROUP BY d.doc_id)
        SELECT doc_id, n_set = 5 AS maybe_seen FROM probe""",

    "ann_topk" -> annTopKOracle,
    "ml_knn" -> mlKnnOracle,
    "ml_centroid" ->
      """WITH q AS (SELECT vec_id, label,
           list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
         FROM embeddings),
       tr AS (SELECT * FROM q WHERE vec_id % 10 <> 0),
       cent AS (SELECT label, d.i AS dim, sum(q[d.i]) AS s,
           CAST(count(*) AS BIGINT) AS n
         FROM tr CROSS JOIN range(1, 65) d(i) GROUP BY label, d.i),
       te AS (SELECT vec_id, label AS label_true, d.i AS dim, q[d.i] AS v
         FROM q CROSS JOIN range(1, 65) d(i) WHERE vec_id % 10 = 0),
       cand AS (SELECT te.vec_id, te.label_true, c.label,
           sum(CAST(c.n * te.v - c.s AS HUGEINT) * (c.n * te.v - c.s)) AS d2n2,
           max(c.n) AS n
         FROM te JOIN cent c USING (dim)
         GROUP BY te.vec_id, te.label_true, c.label)
      SELECT c.vec_id, c.label_true, c.label AS label_pred,
        CAST(c.d2n2 AS BIGINT) AS d2n2, c.n,
        (c.label = c.label_true) AS correct
      FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM cand o WHERE o.vec_id = c.vec_id
        AND (CAST(o.d2n2 AS HUGEINT) * c.n * c.n
               < CAST(c.d2n2 AS HUGEINT) * o.n * o.n
             OR (CAST(o.d2n2 AS HUGEINT) * c.n * c.n
                   = CAST(c.d2n2 AS HUGEINT) * o.n * o.n
                 AND o.label < c.label)))""",
    "ann_ivf" -> annTopKOracle,
    "emb_quantize" ->
      // identical pinned op order: exact max, 127/maxabs division, one
      // multiply, floor(+0.5); literals cast to DOUBLE (DuckDB parses
      // bare decimals as DECIMAL)
      s"""WITH z AS (SELECT vec_id,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
          FROM embeddings),
        q AS (SELECT e.vec_id,
            CASE WHEN z.maxabs = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
                 ELSE z.maxabs / CAST(127.0 AS DOUBLE) END AS scale,
            CASE WHEN z.maxabs = CAST(0.0 AS DOUBLE)
                 THEN list_transform(e.embedding, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(e.embedding, x -> CAST(floor(
                   CAST(x AS DOUBLE) * (CAST(127.0 AS DOUBLE) / z.maxabs)
                   + CAST(0.5 AS DOUBLE)) AS BIGINT)) END AS codes
          FROM embeddings e JOIN z ON e.vec_id = z.vec_id)
        SELECT vec_id, scale,
          CAST(generate_subscripts(codes, 1) - 1 AS INT) AS dim,
          unnest(codes) AS code
        FROM q""",
    "ann_sq8" -> {
      val dot = (1 to 64).map(i => s"a.codes[$i] * b.codes[$i]").mkString(" + ")
      s"""WITH z AS (SELECT vec_id,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
          FROM embeddings),
        q AS (SELECT e.vec_id,
            CASE WHEN z.maxabs = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
                 ELSE z.maxabs / CAST(127.0 AS DOUBLE) END AS scale,
            CASE WHEN z.maxabs = CAST(0.0 AS DOUBLE)
                 THEN list_transform(e.embedding, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(e.embedding, x -> CAST(floor(
                   CAST(x AS DOUBLE) * (CAST(127.0 AS DOUBLE) / z.maxabs)
                   + CAST(0.5 AS DOUBLE)) AS BIGINT)) END AS codes
          FROM embeddings e JOIN z ON e.vec_id = z.vec_id),
        scored AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
            CAST($dot AS DOUBLE) * a.scale * b.scale AS score
          FROM q a JOIN q b ON b.vec_id <> a.vec_id
          WHERE a.vec_id < 50),
        ranked AS (SELECT query_id, neighbor_id, score,
            row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5"""
    },

    // chained 2x reductions, each level from the previous — integer base
    // pixels make every level an exact binary fraction (denominator 4^k),
    // so the group-sum order is immaterial and the chain hash-exact
    "raster_overviews" -> (sqlPx + """,
        lv1 AS (SELECT CAST(x // 2 AS INTEGER) AS x, CAST(y // 2 AS INTEGER) AS y,
          band, sum(v) / 4.0 AS v FROM px GROUP BY 1, 2, 3),
        lv2 AS (SELECT CAST(x // 2 AS INTEGER) AS x, CAST(y // 2 AS INTEGER) AS y,
          band, sum(v) / 4.0 AS v FROM lv1 GROUP BY 1, 2, 3),
        lv3 AS (SELECT CAST(x // 2 AS INTEGER) AS x, CAST(y // 2 AS INTEGER) AS y,
          band, sum(v) / 4.0 AS v FROM lv2 GROUP BY 1, 2, 3),
        lv4 AS (SELECT CAST(x // 2 AS INTEGER) AS x, CAST(y // 2 AS INTEGER) AS y,
          band, sum(v) / 4.0 AS v FROM lv3 GROUP BY 1, 2, 3)
        SELECT 1 AS level, * FROM lv1 UNION ALL SELECT 2, * FROM lv2
        UNION ALL SELECT 3, * FROM lv3 UNION ALL SELECT 4, * FROM lv4"""),
    "raster_resample_avg" -> (sqlPx +
      """ SELECT CAST(x // 4 AS INTEGER) AS x, CAST(y // 4 AS INTEGER) AS y, band,
          sum(v) / 16.0 AS v
        FROM px GROUP BY 1, 2, 3"""),

    "raster_resample_bilinear" ->
      ("""WITH tgt AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           (x + 0.5) / 2 - 0.5 AS sx, (y + 0.5) / 2 - 0.5 AS sy
         FROM range(256) r1(x), range(256) r2(y)),
        c AS (SELECT x, y, sx, sy,
           CAST(floor(sx) AS INTEGER) AS x0, CAST(floor(sy) AS INTEGER) AS y0,
           sx - floor(sx) AS fx, sy - floor(sy) AS fy
         FROM tgt)
        SELECT x, y, 0 AS band,""" +
        bilerpSql("x0", "y0", "fx", "fy") + " AS v FROM c"),

    "raster_resample_cubic" -> cubicOracle,
    "raster_resample_cubicspline" -> separableOracle(2,
      TileOps2.tapWeights(0.25, 2, TileOps2.bsplineWeight, normalize = false),
      TileOps2.tapWeights(0.75, 2, TileOps2.bsplineWeight, normalize = false)),
    "raster_resample_lanczos" -> separableOracle(3,
      TileOps2.tapWeights(0.25, 3, TileOps2.lanczosWeight, normalize = true),
      TileOps2.tapWeights(0.75, 3, TileOps2.lanczosWeight, normalize = true)),

    "raster_resample_mode" -> (sqlPx +
      """, freq AS (SELECT CAST(x // 4 AS INTEGER) AS x, CAST(y // 4 AS INTEGER) AS y,
          band, v, count(*) AS cnt
        FROM px GROUP BY 1, 2, 3, 4)
        SELECT x, y, band, v FROM (
          SELECT x, y, band, v,
            row_number() OVER (PARTITION BY x, y, band ORDER BY cnt DESC, v ASC) AS rn
          FROM freq) WHERE rn = 1"""),

    "raster_resample_median" -> (sqlPx +
      """ SELECT CAST(x // 4 AS INTEGER) AS x, CAST(y // 4 AS INTEGER) AS y, band,
          median(v) AS v
        FROM px GROUP BY 1, 2, 3"""),

    "raster_resample_rms" -> (sqlPx +
      """ SELECT CAST(x // 4 AS INTEGER) AS x, CAST(y // 4 AS INTEGER) AS y, band,
          sqrt(sum(v * v) / count(*)) AS v
        FROM px GROUP BY 1, 2, 3"""),

    "raster_tophat" -> (sqlPxConv +
      """, ero AS (SELECT a.x, a.y, a.band, min(b.v) AS v
          FROM px a JOIN px b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3),
        opened AS (SELECT a.x, a.y, a.band, max(b.v) AS v
          FROM ero a JOIN ero b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3)
        SELECT p.x, p.y, p.band, p.v - o.v AS v
        FROM px p JOIN opened o ON o.x = p.x AND o.y = p.y AND o.band = p.band"""),

    "raster_bothat" -> (sqlPxConv +
      """, dil AS (SELECT a.x, a.y, a.band, max(b.v) AS v
          FROM px a JOIN px b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3),
        closed AS (SELECT a.x, a.y, a.band, min(b.v) AS v
          FROM dil a JOIN dil b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3)
        SELECT p.x, p.y, p.band, c.v - p.v AS v
        FROM px p JOIN closed c ON c.x = p.x AND c.y = p.y AND c.band = p.band"""),

    "raster_morph_diff" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, max(b.v) - min(b.v) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_theilsen" ->
      """WITH px4 AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST(b AS INTEGER) AS band,
           CAST((x*5 + y*3 + b*b*7) % 53 AS DOUBLE) AS v
         FROM range(256) r1(x), range(256) r2(y), range(4) r3(b)),
        piv AS (SELECT x, y,
           max(CASE WHEN band = 0 THEN v END) AS v0,
           max(CASE WHEN band = 1 THEN v END) AS v1,
           max(CASE WHEN band = 2 THEN v END) AS v2,
           max(CASE WHEN band = 3 THEN v END) AS v3
         FROM px4 GROUP BY x, y),
        sl AS (SELECT x, y, unnest([(v1 - v0) / 1.0, (v2 - v0) / 2.0, (v3 - v0) / 3.0,
           (v2 - v1) / 1.0, (v3 - v1) / 2.0, (v3 - v2) / 1.0]) AS s
         FROM piv)
        SELECT x, y, 0 AS band, median(s) AS v FROM sl GROUP BY x, y""",

    "raster_theilsen_robust" ->
      // median -> mad_std mask -> median of kept (timeseries.py:50-113);
      // all-masked pixels fall back to 0 (np.ma.median(...).filled(0))
      """WITH px4 AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST(b AS INTEGER) AS band,
           CAST((x*5 + y*3 + b*b*7) % 53 AS DOUBLE) AS v
         FROM range(256) r1(x), range(256) r2(y), range(4) r3(b)),
        piv AS (SELECT x, y,
           max(CASE WHEN band = 0 THEN v END) AS v0,
           max(CASE WHEN band = 1 THEN v END) AS v1,
           max(CASE WHEN band = 2 THEN v END) AS v2,
           max(CASE WHEN band = 3 THEN v END) AS v3
         FROM px4 GROUP BY x, y),
        sl AS (SELECT x, y, unnest([(v1 - v0) / 1.0, (v2 - v0) / 2.0, (v3 - v0) / 3.0,
           (v2 - v1) / 1.0, (v3 - v1) / 2.0, (v3 - v2) / 1.0]) AS s
         FROM piv),
        med AS (SELECT x, y, median(s) AS m FROM sl GROUP BY x, y),
        mad AS (SELECT sl.x, sl.y,
           CAST(1.4826 AS DOUBLE) * median(abs(sl.s - med.m)) AS ms, med.m
         FROM sl JOIN med USING (x, y) GROUP BY sl.x, sl.y, med.m)
        SELECT sl.x, sl.y, 0 AS band,
          COALESCE(median(sl.s) FILTER (
            WHERE sl.s >= mad.m - mad.ms * 1.0 AND sl.s <= mad.m + mad.ms * 1.0), 0.0) AS v
        FROM sl JOIN mad USING (x, y)
        GROUP BY sl.x, sl.y, mad.m, mad.ms""",

    "raster_flowdir" -> (d8OracleHead +
      """ SELECT d.x, d.y, 0 AS band,
          CAST(CASE WHEN b.md <= 0.0 THEN 0 ELSE min(d.code) END AS DOUBLE) AS v
        FROM drops d JOIN best b ON d.x = b.x AND d.y = b.y
        WHERE b.md <= 0.0 OR d.dr = b.md
        GROUP BY d.x, d.y, b.md"""),

    // the marching-squares case table replayed as a VALUES relation
    // (edge ids 0=top 1=right 2=bottom 3=left; saddles keyed on the
    // center-average decider) — a hash match certifies the Spark halo
    // walk emits exactly one segment set per 2x2 cell
    "raster_contours" ->
      """WITH cell AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST((x*3 + y*5) % 41 AS DOUBLE) AS z00,
           CAST(((x+1)*3 + y*5) % 41 AS DOUBLE) AS z10,
           CAST((x*3 + (y+1)*5) % 41 AS DOUBLE) AS z01,
           CAST(((x+1)*3 + (y+1)*5) % 41 AS DOUBLE) AS z11
         FROM range(255) r1(x), range(255) r2(y)),
        m AS (SELECT *,
           (CASE WHEN z00 > 20.5 THEN 1 ELSE 0 END
            + CASE WHEN z10 > 20.5 THEN 2 ELSE 0 END
            + CASE WHEN z11 > 20.5 THEN 4 ELSE 0 END
            + CASE WHEN z01 > 20.5 THEN 8 ELSE 0 END) AS mask,
           (z00 + z10 + z01 + z11) / 4.0 > 20.5 AS ctr FROM cell),
        st(mask, saddle_in, seg, e0, e1) AS (VALUES
          (1, NULL, 0, 3, 0), (2, NULL, 0, 0, 1), (3, NULL, 0, 3, 1),
          (4, NULL, 0, 1, 2),
          (5, TRUE, 0, 0, 1), (5, TRUE, 1, 3, 2),
          (5, FALSE, 0, 3, 0), (5, FALSE, 1, 1, 2),
          (6, NULL, 0, 0, 2), (7, NULL, 0, 3, 2), (8, NULL, 0, 3, 2),
          (9, NULL, 0, 0, 2),
          (10, TRUE, 0, 3, 0), (10, TRUE, 1, 1, 2),
          (10, FALSE, 0, 0, 1), (10, FALSE, 1, 3, 2),
          (11, NULL, 0, 1, 2), (12, NULL, 0, 3, 1), (13, NULL, 0, 0, 1),
          (14, NULL, 0, 3, 0)),
        j AS (SELECT m.*, st.seg, st.e0, st.e1 FROM m JOIN st
          ON m.mask = st.mask AND (st.saddle_in IS NULL OR st.saddle_in = m.ctr))
        SELECT x, y, 0 AS band, seg,
          CASE e0 WHEN 0 THEN x + (20.5 - z00) / (z10 - z00)
                  WHEN 1 THEN CAST(x + 1 AS DOUBLE)
                  WHEN 2 THEN x + (20.5 - z01) / (z11 - z01)
                  ELSE CAST(x AS DOUBLE) END AS x0,
          CASE e0 WHEN 0 THEN CAST(y AS DOUBLE)
                  WHEN 1 THEN y + (20.5 - z10) / (z11 - z10)
                  WHEN 2 THEN CAST(y + 1 AS DOUBLE)
                  ELSE y + (20.5 - z00) / (z01 - z00) END AS y0,
          CASE e1 WHEN 0 THEN x + (20.5 - z00) / (z10 - z00)
                  WHEN 1 THEN CAST(x + 1 AS DOUBLE)
                  WHEN 2 THEN x + (20.5 - z01) / (z11 - z01)
                  ELSE CAST(x AS DOUBLE) END AS x1,
          CASE e1 WHEN 0 THEN CAST(y AS DOUBLE)
                  WHEN 1 THEN y + (20.5 - z10) / (z11 - z10)
                  WHEN 2 THEN CAST(y + 1 AS DOUBLE)
                  ELSE y + (20.5 - z00) / (z01 - z00) END AS y1
        FROM j""",
    // closed-form octile metric: same-side targets take the direct
    // (max-min) + min*sqrt2 geodesic, cross-side targets the through-gap
    // sum — integer move counts all the way, one FP expression at the
    // end, argmin by value then counts; a hash match certifies the
    // exact-integer Dijkstra + cross-tile iteration end to end
    "raster_costdist" -> (s"WITH $sqlCostBest" +
      """ SELECT x, y, CAST(cs AS INTEGER) AS s, CAST(cd AS INTEGER) AS d,
          cs + cd * sqrt(2.0) AS dist
        FROM bestd"""),
    // every non-source cell's best predecessor derived from the SAME
    // closed-form field: neighbor u qualifies iff dist(v) = dist(u)+step
    // EXACTLY in the integer (s,d) algebra; min code mirrors the Spark
    // tie-break, sources coalesce to 0
    "raster_cost_backlink" -> (s"WITH $sqlCostBest," +
      """ d8(code, dx, dy, diag) AS (VALUES
          (1, 1, 0, FALSE), (2, 1, 1, TRUE), (4, 0, 1, FALSE),
          (8, -1, 1, TRUE), (16, -1, 0, FALSE), (32, -1, -1, TRUE),
          (64, 0, -1, FALSE), (128, 1, -1, TRUE)),
        bk AS (SELECT v.x, v.y, min(m.code) AS code
          FROM bestd v CROSS JOIN d8 m
          JOIN bestd u ON u.x = v.x + m.dx AND u.y = v.y + m.dy
          WHERE (NOT m.diag AND u.cs + 1 = v.cs AND u.cd = v.cd)
             OR (m.diag AND u.cs = v.cs AND u.cd + 1 = v.cd)
          GROUP BY v.x, v.y)
        SELECT v.x, v.y, CAST(COALESCE(bk.code, 0) AS INTEGER) AS code
        FROM bestd v LEFT JOIN bk ON bk.x = v.x AND bk.y = v.y"""),
    // re-walks every D8 path one hop at a time and counts landings per
    // cell; a hash match certifies the two-level tile condensation
    // (within-tile Kahn + cross-tile entry forwarding) end to end
    "raster_flowacc" -> ("WITH RECURSIVE " + d8OracleBody +
      """, fd AS (SELECT d.x, d.y,
            CAST(CASE WHEN b.md <= 0.0 THEN 0 ELSE min(d.code) END AS INTEGER) AS code
          FROM drops d JOIN best b ON d.x = b.x AND d.y = b.y
          WHERE b.md <= 0.0 OR d.dr = b.md
          GROUP BY d.x, d.y, b.md),
        step AS (SELECT f.x, f.y, f.code, d.dx, d.dy
          FROM fd f LEFT JOIN dirs d ON d.code = f.code),
        walk AS (
          SELECT x, y, 0 AS hops FROM fd
          UNION ALL
          SELECT w.x + s.dx, w.y + s.dy, w.hops + 1
          FROM walk w JOIN step s ON s.x = w.x AND s.y = w.y AND s.code <> 0),
        ups AS (SELECT x, y, count(*) AS n FROM walk WHERE hops >= 1 GROUP BY x, y)
        SELECT f.x, f.y, CAST(COALESCE(u.n, 0) AS BIGINT) AS acc
        FROM fd f LEFT JOIN ups u ON u.x = f.x AND u.y = f.y"""),
    // walks every D8 path one hop at a time; the Spark side resolves the
    // same function by pointer doubling, so a hash match certifies both
    // the sink assignment AND the exact hop counts
    "raster_watershed" -> ("WITH RECURSIVE " + d8OracleBody +
      """, fd AS (SELECT d.x, d.y,
            CAST(CASE WHEN b.md <= 0.0 THEN 0 ELSE min(d.code) END AS INTEGER) AS code
          FROM drops d JOIN best b ON d.x = b.x AND d.y = b.y
          WHERE b.md <= 0.0 OR d.dr = b.md
          GROUP BY d.x, d.y, b.md),
        step AS (SELECT f.x, f.y, f.code, d.dx, d.dy
          FROM fd f LEFT JOIN dirs d ON d.code = f.code),
        walk AS (
          SELECT x AS x0, y AS y0, x, y, 0 AS hops FROM fd
          UNION ALL
          SELECT w.x0, w.y0, w.x + s.dx, w.y + s.dy, w.hops + 1
          FROM walk w JOIN step s ON s.x = w.x AND s.y = w.y AND s.code <> 0)
        SELECT w.x0 AS x, w.y0 AS y,
          CAST(w.x AS INTEGER) AS sink_x, CAST(w.y AS INTEGER) AS sink_y,
          CAST(w.hops AS BIGINT) AS hops
        FROM walk w JOIN fd f ON f.x = w.x AND f.y = w.y
        WHERE f.code = 0"""),
    "raster_terrain" ->
      // 8-neighbor fold with out-of-raster neighbors taking the center
      // value (the gradientsCombine edge convention); integer DEM makes
      // every sum/divide exact
      """WITH d AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST((x*3 + y*5) % 41 AS DOUBLE) AS v
         FROM range(96) r1(x), range(96) r2(y)),
        nb AS (SELECT a.x, a.y, a.v AS ctr, COALESCE(b.v, a.v) AS nv
          FROM d a
          CROSS JOIN (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(1,0),(-1,1),(0,1),(1,1)) o(dx,dy)
          LEFT JOIN d b ON b.x = a.x + o.dx AND b.y = a.y + o.dy),
        agg AS (SELECT x, y, ctr,
            sum(abs(ctr - nv)) AS sabs, sum(nv) AS snv,
            greatest(max(nv), ctr) AS mx, least(min(nv), ctr) AS mn
          FROM nb GROUP BY 1, 2, 3)
        SELECT x, y, 0 AS band, sabs / 8.0 AS v FROM agg
        UNION ALL SELECT x, y, 1, ctr - snv / 8.0 FROM agg
        UNION ALL SELECT x, y, 2, mx - mn FROM agg""",

    "raster_dem_gradients" -> demGradOracle,
    "raster_dem_orientation" -> demOrientOracle,
    "raster_hillshade" -> demHillshadeOracle,
    "raster_ndvi" -> (sqlPx +
      """ SELECT a.x, a.y, 0 AS band,
          CASE WHEN a.v + b.v = 0.0 THEN 0.0 ELSE (a.v - b.v) / (a.v + b.v) END AS v
        FROM px a JOIN px b ON a.x = b.x AND a.y = b.y
        WHERE a.band = 1 AND b.band = 0"""),
    // inverse mapping per 4326 target pixel center: forward Mercator to
    // 3857 meters, floor to the 1000 m source grid, sample the closed
    // form; outside the 128×128 source → dst_nodata (-1)
    "raster_warp" ->
      """WITH base AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
          FROM range(88) r1(x), range(64) r2(y)),
        proj AS (SELECT x, y,
          6378137.0 * radians(CAST(-0.125 AS DOUBLE) + (CAST(x AS DOUBLE) + 0.5) * 0.015625) AS sx,
          6378137.0 * ln(tan(pi() / 4.0 +
            radians(CAST(52.5 AS DOUBLE) + (CAST(y AS DOUBLE) + 0.5) * (-0.015625)) / 2.0)) AS sy
         FROM base),
        px AS (SELECT x, y,
          CAST(FLOOR(sx / 1000.0) AS INTEGER) AS sc,
          CAST(FLOOR((sy - 6800000.0) / (-1000.0)) AS INTEGER) AS sr
         FROM proj)
        SELECT x, y, 0 AS band,
          CASE WHEN sc BETWEEN 0 AND 127 AND sr BETWEEN 0 AND 127
               THEN CAST((sc * 7 + sr * 13) % 97 AS DOUBLE) ELSE -1.0 END AS v
        FROM px""",

    "raster_convolve_quantile" -> (sqlPxConv +
      // the reference's weighted-quantile with equal weights interpolates
      // at position q*n - 0.5 (funcs.py:115-130), not quantile_cont's
      // q*(n-1)
      """, hood AS (SELECT a.x, a.y, a.band,
            list(b.v ORDER BY b.v) AS vs, CAST(count(*) AS INTEGER) AS n
          FROM px a JOIN px b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3)
        SELECT x, y, band,
          CASE WHEN 0.25 * n - 0.5 <= 0 THEN vs[1]
               WHEN 0.25 * n - 0.5 >= n - 1 THEN vs[n]
               ELSE vs[CAST(floor(0.25 * n - 0.5) AS INTEGER) + 1]
                 + (vs[CAST(floor(0.25 * n - 0.5) AS INTEGER) + 2]
                    - vs[CAST(floor(0.25 * n - 0.5) AS INTEGER) + 1])
                   * ((0.25 * n - 0.5) - floor(0.25 * n - 0.5))
          END AS v
        FROM hood"""),

    "raster_convolve_occurrences" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band,
          CAST(count(*) FILTER (WHERE b.v = a.v) AS DOUBLE) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band, a.v"""),

    "raster_convolve_sigmalee" -> (sqlPxConv +
      // reference sigma-lee (funcs.py:202-242): select |v| >= σ (first
      // attempt's criterion — later attempts only re-count), mean of the
      // selection; fall back to the hood mean if nothing selects
      """, stats AS (SELECT a.x, a.y, a.band,
          CAST(count(*) AS BIGINT) AS n, sum(b.v) AS s, sum(b.v * b.v) AS s2
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band)
        SELECT st.x, st.y, st.band,
          COALESCE(
            sum(b.v) FILTER (WHERE abs(b.v) >= sqrt((st.s2 - st.s * st.s / st.n) / st.n))
              / count(*) FILTER (WHERE abs(b.v) >= sqrt((st.s2 - st.s * st.s / st.n) / st.n)),
            st.s / st.n) AS v
        FROM stats st JOIN px b
          ON b.band = st.band AND b.x BETWEEN st.x - 1 AND st.x + 1
          AND b.y BETWEEN st.y - 1 AND st.y + 1
        GROUP BY st.x, st.y, st.band, st.n, st.s, st.s2"""),

    "raster_convolve_mean" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, sum(b.v) / count(*) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_convolve_contrast" -> (sqlPxConv +
      // |max(v·w) - min(v/(w+1e-7))| with raw uniform weights w=1
      // (funcs.py:100-111)
      """ SELECT a.x, a.y, a.band,
          abs(max(b.v) * 1.0 - min(b.v) / (1.0 + 1e-7)) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_convolve_zscore" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band,
          (a.v - sum(b.v) / count(*))
            / sqrt((sum(b.v * b.v) - sum(b.v) * sum(b.v) / count(*)) / count(*)) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band, a.v"""),

    "raster_convolve_zscore_mad" -> (sqlPxConv +
      """, med AS (SELECT a.x, a.y, a.band, a.v AS cv, median(b.v) AS m
          FROM px a JOIN px b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3, 4)
        SELECT med.x, med.y, med.band,
          (med.cv - med.m) / (median(abs(b.v - med.m)) * CAST(1.4826 AS DOUBLE)) AS v
        FROM med JOIN px b
          ON b.band = med.band AND b.x BETWEEN med.x - 1 AND med.x + 1
          AND b.y BETWEEN med.y - 1 AND med.y + 1
        GROUP BY med.x, med.y, med.band, med.cv, med.m"""),

    "raster_convolve_roughness" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, max(abs(b.v - a.v)) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band, a.v"""),

    "raster_convolve_tri" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, sum(abs(b.v - a.v)) / (count(*) - 1) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band, a.v"""),

    "raster_convolve_tpi" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band,
          abs(a.v - (sum(b.v) - a.v) / (count(*) - 1)) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band, a.v"""),

    "raster_convolve_feather" -> (sqlPxConv +
      // Σw[v==0] normalized twice: by present count (edge renorm of the
      // normalized kernel) and by hood size (funcs.py:76-97 normalise)
      """ SELECT a.x, a.y, a.band,
          (CAST(count(*) FILTER (WHERE b.v = 0.0) AS DOUBLE) / count(*)) / count(*) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_convolve_mad" -> (sqlPxConv +
      """, med AS (SELECT a.x, a.y, a.band, median(b.v) AS m
          FROM px a JOIN px b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3)
        SELECT med.x, med.y, med.band, median(abs(b.v - med.m)) AS v
        FROM med JOIN px b
          ON b.band = med.band AND b.x BETWEEN med.x - 1 AND med.x + 1
          AND b.y BETWEEN med.y - 1 AND med.y + 1
        GROUP BY med.x, med.y, med.band, med.m"""),

    "raster_shift" -> (sqlPx.replace("range(256) r1(x), range(256) r2(y)", "range(4) r1(x), range(4) r2(y)") +
      """ SELECT x AS cell_x, y AS cell_y, band,
          0.0 + x * 64 * 0.25 + 3.0 AS origin_x,
          64.0 + y * 64 * -0.25 + -2.0 AS origin_y
        FROM px"""),

    "raster_border" ->
      """WITH ex AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
         FROM range(272) r1(x), range(272) r2(y))
        SELECT x, y, 0 AS band,
          CASE WHEN x - 8 BETWEEN 0 AND 255 AND y - 8 BETWEEN 0 AND 255
               THEN CAST(((x - 8) * 7 + (y - 8) * 13) % 97 AS DOUBLE)
               ELSE 7.0 END AS v
        FROM ex""",

    "geo_cell_counts_salted" -> Pages.sqlWith(
      s"""SELECT ${Pages.sqlCellX(Pages.FineLevel)} * 4096 + ${Pages.sqlCellY(Pages.FineLevel)} AS cell_key,
          CAST(count(*) AS BIGINT) AS n_pages
        FROM pages GROUP BY 1"""),

    "geo_cell_distinct_salted" -> Pages.sqlWith(
      s"""SELECT ${Pages.sqlCellX(Pages.FineLevel)} * 4096 + ${Pages.sqlCellY(Pages.FineLevel)} AS cell_key,
          CAST(count(DISTINCT split_part(url, '/', 3)) AS BIGINT) AS n_hosts
        FROM pages GROUP BY 1"""),

    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(round(l_quantity * 10000.0) AS BIGINT)) AS BIGINT) AS sum_qty_q,
         CAST(sum(CAST(round(l_extendedprice * 10000.0) AS BIGINT)) AS BIGINT) AS sum_base_q,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS sum_disc_q,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000.0) AS BIGINT)) AS BIGINT) AS sum_charge_q,
         CAST(count(*) AS BIGINT) AS n
       FROM lineitem WHERE l_quantity < 30
       GROUP BY 1, 2""",

    "tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_q,
         CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
       FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l
         WHERE l.l_orderkey = o.o_orderkey
           AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
       GROUP BY 1""",

    "tpch_q12" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
       GROUP BY 1""",

    "tpch_q19" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_q,
         CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#33' AND p_size BETWEEN 25 AND 50 AND l_quantity BETWEEN 20 AND 30)""",

    "tpch_q14" ->
      """WITH li AS (SELECT l_partkey,
           CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT) AS rev_q
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-03-01'),
        t AS (SELECT
           CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN li.rev_q ELSE 0 END) AS BIGINT) AS promo_q,
           CAST(sum(li.rev_q) AS BIGINT) AS total_q
         FROM li JOIN part p ON li.l_partkey = p.p_partkey)
        SELECT promo_q, total_q,
          CAST((CAST(promo_q AS HUGEINT) * 1000000) // total_q AS BIGINT) AS promo_ppm
        FROM t""",

    "tpch_q13" ->
      """WITH pc AS (SELECT o_custkey, count(*) AS cnt FROM orders
         WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
       SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
         SELECT CAST(coalesce(pc.cnt, 0) AS BIGINT) AS c_count
         FROM customer c LEFT JOIN pc ON c.c_custkey = pc.o_custkey)
       GROUP BY 1""",

    // dominance on the quantized price (1e-4 ticks), exactly like the
    // Spark side; duplicated (price, size) points are mutually
    // non-dominating and both survive
    "part_skyline" ->
      """WITH q AS (SELECT p_partkey, p_retailprice, p_size,
           CAST(round(p_retailprice * 10000.0) AS BIGINT) AS price_q FROM part)
       SELECT a.p_partkey, a.p_retailprice, a.p_size FROM q a
       WHERE NOT EXISTS (SELECT 1 FROM q b WHERE b.price_q <= a.price_q
         AND b.p_size >= a.p_size
         AND (b.price_q < a.price_q OR b.p_size > a.p_size))""",

    // brute-force interval self-join over the SAME gap-rule session
    // CTE chain — a hash match certifies the bucket-explode equi-join +
    // overlap-start dedup lossless and duplicate-free
    "events_copresence" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        l AS (SELECT user_id, us, event_id,
            lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        br AS (SELECT user_id, us, event_id,
            CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
        s AS (SELECT user_id, us,
            sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM br),
        iv AS (SELECT user_id, sid, min(us) AS t0, max(us) AS t1 FROM s GROUP BY 1, 2)
        SELECT a.user_id AS user_a, b2.user_id AS user_b,
          CAST(a.sid AS BIGINT) AS sid_a, CAST(b2.sid AS BIGINT) AS sid_b,
          greatest(a.t0, b2.t0) AS ov_start_us,
          least(a.t1, b2.t1) - greatest(a.t0, b2.t0) AS ov_us
        FROM iv a JOIN iv b2 ON a.user_id < b2.user_id
          AND a.t0 <= b2.t1 AND b2.t0 <= a.t1""",

    "tpch_q3" ->
      """WITH rev AS (SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_q
         FROM lineitem GROUP BY 1)
        SELECT rev.l_orderkey AS orderkey, rev.revenue_q, c.c_mktsegment, o.o_orderpriority
        FROM rev JOIN orders o ON rev.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY rev.revenue_q DESC, orderkey LIMIT 10""",

    "tpch_q10" ->
      """WITH f AS (SELECT l_orderkey, l_extendedprice, l_discount
           FROM lineitem WHERE l_returnflag = 'R'),
         ow AS (SELECT o_orderkey, o_custkey FROM orders
           WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'),
         j AS (SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0) AS BIGINT) AS rq,
             CAST(round(c.c_acctbal * 10000.0) AS BIGINT) AS aq
           FROM f l JOIN ow ON l.l_orderkey = ow.o_orderkey
           JOIN customer c ON ow.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey)
        SELECT c_custkey, c_name, n_name,
          CAST(sum(rq) AS BIGINT) AS revenue_q, max(aq) AS acctbal_q,
          CAST(count(*) AS BIGINT) AS n_items
        FROM j GROUP BY 1, 2, 3
        ORDER BY revenue_q DESC, c_custkey LIMIT 20""",

    "tpch_q5" ->
      """SELECT r.r_name, n.n_name,
         CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_q,
         CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY 1, 2""",

    "tpch_q2" ->
      """WITH sr AS (
           SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
           FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'),
         offers AS (
           SELECT p.p_partkey, p.p_brand, sr.s_suppkey, sr.s_name, sr.s_acctbal, sr.n_name,
             min(CAST(round(l.l_extendedprice * 10000.0) AS BIGINT)) AS offer_q
           FROM lineitem l JOIN sr ON l.l_suppkey = sr.s_suppkey
           JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size >= 30
           GROUP BY 1, 2, 3, 4, 5, 6),
         best AS (SELECT p_partkey AS bp, min(offer_q) AS best_q FROM offers GROUP BY 1)
        SELECT o.p_partkey, o.p_brand, o.s_suppkey, o.s_name,
          CAST(round(o.s_acctbal * 10000.0) AS BIGINT) AS acctbal_q, o.n_name, o.offer_q
        FROM offers o JOIN best b ON o.p_partkey = b.bp AND o.offer_q = b.best_q""",

    "tpch_q7" ->
      """WITH sn AS (SELECT s_suppkey, n_name AS supp_nation
             FROM supplier JOIN nation ON s_nationkey = n_nationkey),
           cn AS (SELECT c_custkey, n_name AS cust_nation
             FROM customer JOIN nation ON c_nationkey = n_nationkey)
        SELECT supp_nation, cust_nation, CAST(year(l_shipdate) AS INT) AS l_year,
          CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_q,
          CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN cn ON o.o_custkey = cn.c_custkey
        JOIN sn ON l.l_suppkey = sn.s_suppkey
        WHERE supp_nation <> cust_nation
        GROUP BY 1, 2, 3""",

    "tpch_q8" ->
      """WITH cr AS (SELECT c_custkey FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'),
           sn AS (SELECT s_suppkey, n_name AS supp_nation
             FROM supplier JOIN nation ON s_nationkey = n_nationkey),
           vol AS (SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0) AS BIGINT) AS vol_q,
               sn.supp_nation
             FROM lineitem l
             JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
             JOIN orders o ON l.l_orderkey = o.o_orderkey
             JOIN sn ON l.l_suppkey = sn.s_suppkey
             WHERE o.o_custkey IN (SELECT c_custkey FROM cr))
        SELECT o_year,
          CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_q ELSE 0 END) AS BIGINT) AS nation_q,
          CAST(sum(vol_q) AS BIGINT) AS total_q,
          CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_q ELSE 0 END) AS HUGEINT) * 1000000)
               // sum(vol_q) AS BIGINT) AS share_ppm
        FROM vol GROUP BY 1""",

    "tpch_q9" ->
      """WITH sn AS (SELECT s_suppkey, n_name AS nation
             FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        SELECT sn.nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
          CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0) AS BIGINT)
                 - CAST(round(p.p_retailprice * 0.6 * l.l_quantity * 10000.0) AS BIGINT)) AS BIGINT) AS profit_q,
          CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN sn ON l.l_suppkey = sn.s_suppkey
        GROUP BY 1, 2""",

    "tpch_q11" ->
      """WITH sg AS (SELECT s_suppkey FROM supplier
             JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'),
           pp AS (SELECT l_partkey AS partkey,
               CAST(sum(CAST(round(l_extendedprice * 10000.0) AS BIGINT)) AS BIGINT) AS value_q
             FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM sg) GROUP BY 1),
           t AS (SELECT CAST(sum(value_q) AS BIGINT) AS total_q,
                 CAST(count(*) AS BIGINT) AS n_parts FROM pp)
        SELECT partkey, value_q FROM pp CROSS JOIN t
        WHERE CAST(value_q AS HUGEINT) * 4 * n_parts > CAST(total_q AS HUGEINT) * 5""",

    "tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_q
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1),
         b AS (SELECT max(revenue_q) AS best_q FROM rev)
        SELECT s.s_suppkey, s.s_name, r.revenue_q
        FROM rev r CROSS JOIN b
        JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.revenue_q = b.best_q""",

    "tpch_q16" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand <> 'Brand#13'
         GROUP BY 1, 2, 3""",

    "tpch_q17" ->
      """WITH pp AS (SELECT l_partkey AS a_partkey,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n_lines
           FROM lineitem GROUP BY 1)
        SELECT CAST(sum(CAST(round(l.l_extendedprice * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_q,
          CAST(count(*) AS BIGINT) AS n_lines_small
        FROM lineitem l JOIN pp ON l.l_partkey = pp.a_partkey
        WHERE CAST(l.l_quantity AS BIGINT) * 5 * pp.n_lines < pp.sum_qty""",

    "tpch_q20" ->
      """WITH li AS (SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS qty
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             WHERE p.p_name LIKE '%widget%'),
           ps AS (SELECT l_partkey, l_suppkey, sum(qty) AS supp_qty FROM li GROUP BY 1, 2),
           pt AS (SELECT l_partkey AS t_partkey, sum(qty) AS total_qty FROM li GROUP BY 1)
        SELECT s.s_suppkey, s.s_name, s.s_nationkey
        FROM supplier s WHERE s.s_suppkey IN (
          SELECT ps.l_suppkey FROM ps JOIN pt ON ps.l_partkey = pt.t_partkey
          WHERE ps.supp_qty * 10 > pt.total_qty * 3)""",

    "tpch_q21" ->
      """WITH li AS (SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY) AS late
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         l1 AS (SELECT DISTINCT l_orderkey AS k1, l_suppkey AS s1 FROM li WHERE late)
        SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM l1 JOIN supplier s ON l1.s1 = s.s_suppkey
        WHERE EXISTS (SELECT 1 FROM li a
            WHERE a.l_orderkey = l1.k1 AND a.l_suppkey <> l1.s1)
          AND NOT EXISTS (SELECT 1 FROM li b
            WHERE b.l_orderkey = l1.k1 AND b.l_suppkey <> l1.s1 AND b.late)
        GROUP BY 1, 2
        ORDER BY numwait DESC, s.s_suppkey LIMIT 20""",

    "tpch_q22" ->
      """WITH cust AS (SELECT c_custkey, c_nationkey % 7 AS cntrycode,
             CAST(round(c_acctbal * 10000.0) AS BIGINT) AS bal_q
           FROM customer WHERE (c_nationkey % 7) IN (1, 2, 4)),
         ap AS (SELECT CAST(sum(bal_q) AS BIGINT) AS sum_bal,
             CAST(count(*) AS BIGINT) AS n_pos FROM cust WHERE bal_q > 0)
        SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
          CAST(sum(bal_q) AS BIGINT) AS totacctbal_q
        FROM cust CROSS JOIN ap
        WHERE bal_q * n_pos > sum_bal
          AND c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY 1""",

    "raster_hypsometric" ->
      """WITH px AS (SELECT CAST((x*3 + y*5) % 41 AS BIGINT) AS elev
           FROM range(96) r1(x), range(96) r2(y)),
        pe AS (SELECT elev, CAST(count(*) AS BIGINT) AS area
               FROM px GROUP BY elev),
        t AS (SELECT CAST(sum(area) AS BIGINT) AS total_area FROM pe)
        SELECT elev, area,
          CAST(sum(area) OVER (ORDER BY elev DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_area_above,
          t.total_area,
          CAST(sum(area) OVER (ORDER BY elev DESC ROWS UNBOUNDED PRECEDING)
               * 1000000 // t.total_area AS BIGINT) AS frac_above_ppm
        FROM pe CROSS JOIN t""",

    "select_reservoir" ->
      """WITH h AS (SELECT *,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS sh
         FROM documents),
        r AS (SELECT *, row_number() OVER
           (PARTITION BY lang ORDER BY sh, doc_id) AS rk FROM h)
        SELECT doc_id, text, lang, source, n_chars FROM r WHERE rk <= 8""",

    "dedup_fuzzy_pairs" ->
      """WITH keyed AS (SELECT doc_id AS id, substr(text, 1, 24) AS k,
           substr(text, 1, 2) AS blk FROM documents),
        capped AS (SELECT * FROM (SELECT *, row_number() OVER
            (PARTITION BY blk ORDER BY id) AS rnk FROM keyed)
          WHERE rnk <= 256)
        SELECT a.id AS id_a, b.id AS id_b,
          CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
        FROM capped a JOIN capped b ON a.blk = b.blk AND a.id < b.id
        WHERE levenshtein(a.k, b.k) <= 2""",

    "ml_stump" ->
      """WITH m AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
             'f_chars' AS feature, n_chars AS value FROM documents
           UNION ALL
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END, 'f_digits',
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
           FROM documents),
         rg AS (SELECT feature, min(value) AS vmin, max(value) AS vmax FROM m GROUP BY 1),
         h AS (SELECT m.feature,
             CAST((m.value - rg.vmin) * 16 // (rg.vmax - rg.vmin + 1) AS INT) AS bin,
             CAST(count(CASE WHEN label = 0 THEN 1 END) AS BIGINT) AS c0,
             CAST(count(CASE WHEN label <> 0 THEN 1 END) AS BIGINT) AS c1
           FROM m JOIN rg ON m.feature = rg.feature GROUP BY 1, 2),
         c AS (SELECT feature, bin,
             sum(c0) OVER wo AS c0l, sum(c1) OVER wo AS c1l,
             sum(c0) OVER wa AS ct0, sum(c1) OVER wa AS ct1
           FROM h WINDOW wo AS (PARTITION BY feature ORDER BY bin),
                         wa AS (PARTITION BY feature)),
         k AS (SELECT feature, bin, CAST(c0l AS BIGINT) AS c0l,
             CAST(c1l AS BIGINT) AS c1l, CAST(c0l + c1l AS BIGINT) AS nl,
             CAST(ct0 + ct1 - c0l - c1l AS BIGINT) AS nr,
             CAST(ct0 - c0l AS BIGINT) AS c0r, CAST(ct1 - c1l AS BIGINT) AS c1r
           FROM c WHERE c0l + c1l > 0 AND ct0 + ct1 - c0l - c1l > 0),
         sc AS (SELECT *,
             CAST((CAST(c0l AS HUGEINT)*c0l + CAST(c1l AS HUGEINT)*c1l) * nr
                + (CAST(c0r AS HUGEINT)*c0r + CAST(c1r AS HUGEINT)*c1r) * nl
               AS DECIMAL(38,0)) AS a,
             CAST(CAST(nl AS HUGEINT) * nr AS DECIMAL(38,0)) AS b
           FROM k)
        SELECT sc.feature, sc.bin, sc.nl, sc.nr, sc.c0l, sc.c1l, sc.c0r, sc.c1r,
          sc.a, sc.b, rg.vmin, rg.vmax
        FROM sc JOIN rg ON sc.feature = rg.feature
        WHERE NOT EXISTS (SELECT 1 FROM sc d
          WHERE (CAST(d.a AS HUGEINT) * CAST(sc.b AS HUGEINT)
                   > CAST(sc.a AS HUGEINT) * CAST(d.b AS HUGEINT))
             OR (CAST(d.a AS HUGEINT) * CAST(sc.b AS HUGEINT)
                   = CAST(sc.a AS HUGEINT) * CAST(d.b AS HUGEINT)
                 AND (d.feature < sc.feature
                      OR (d.feature = sc.feature AND d.bin < sc.bin))))""",

    "orders_rfm" ->
      """WITH md AS (SELECT max(o_orderdate) AS max_d FROM orders),
        per AS (SELECT o_custkey,
            CAST(datediff('day', max(o_orderdate), (SELECT max_d FROM md)) AS BIGINT)
              AS recency_days,
            CAST(count(*) AS BIGINT) AS frequency,
            CAST(sum(CAST(round(o_totalprice * 10000.0) AS BIGINT)) AS BIGINT)
              AS monetary_q
          FROM orders GROUP BY 1)
        SELECT o_custkey, recency_days, frequency, monetary_q,
          CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_quintile,
          CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_quintile,
          CAST(ntile(5) OVER (ORDER BY monetary_q DESC, o_custkey) AS BIGINT) AS m_quintile
        FROM per""",

    "emb_center" ->
      """WITH q AS (SELECT e.vec_id, CAST(gs.i AS INT) AS pos,
           CAST(round(CAST(e.embedding[gs.i + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS v
         FROM embeddings e, generate_series(0, 63) gs(i)),
        s AS (SELECT pos, CAST(sum(v) AS BIGINT) AS dim_sum,
            CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1)
        SELECT q.vec_id, q.pos, CAST(q.v * s.n - s.dim_sum AS BIGINT) AS centered_n, s.n
        FROM q JOIN s ON q.pos = s.pos""",

    "basket_pairs" ->
      """WITH it0 AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        it AS (SELECT okey, brand FROM (SELECT okey, brand,
            row_number() OVER (PARTITION BY okey ORDER BY brand) AS rnk
          FROM it0) WHERE rnk <= 32),
        t AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM it),
        c AS (SELECT brand, CAST(count(*) AS BIGINT) AS n FROM it GROUP BY 1),
        pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
            CAST(count(*) AS BIGINT) AS n_ab
          FROM it a JOIN it b ON a.okey = b.okey AND a.brand < b.brand
          GROUP BY 1, 2)
        SELECT pr.brand_a, pr.brand_b, pr.n_ab, ca.n AS n_a, cb.n AS n_b,
          t.n_orders,
          CAST(CAST(pr.n_ab AS HUGEINT) * t.n_orders * 1000000
               // (CAST(ca.n AS HUGEINT) * cb.n) AS BIGINT) AS lift_ppm
        FROM pr JOIN c ca ON pr.brand_a = ca.brand
        JOIN c cb ON pr.brand_b = cb.brand CROSS JOIN t""",

    "quality_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count($c) AS BIGINT) AS n_filled,
              CAST(count(*) - count($c) AS BIGINT) AS n_null,
              CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
              CAST(count($c) * 1000000 // count(*) AS BIGINT) AS completeness_ppm
            FROM orders"""
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(one).mkString("\nUNION ALL\n")
    },

    "quality_summary" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", CAST(count($c) AS BIGINT) AS n_filled,
              min(CAST(round($c * 10000.0) AS BIGINT)) AS min_q,
              max(CAST(round($c * 10000.0) AS BIGINT)) AS max_q,
              CAST(sum(CAST(round($c * 10000.0) AS BIGINT)) AS BIGINT) AS sum_q
            FROM lineitem"""
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(one).mkString("\nUNION ALL\n")
    },

    "quality_checks" ->
      """SELECT 'complete(o_custkey)' AS "check", num, den,
           num * 1000000 >= 1000000 * den AS passed
         FROM (SELECT CAST(count(o_custkey) AS BIGINT) AS num,
                      CAST(count(*) AS BIGINT) AS den FROM orders)
        UNION ALL
        SELECT 'unique(o_orderkey)', num, den, num = den
        FROM (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT),
                     CAST(count(o_orderkey) AS BIGINT) FROM orders) t1(num, den)
        UNION ALL
        SELECT 'unique(o_custkey)', num, den, num = den
        FROM (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT),
                     CAST(count(o_custkey) AS BIGINT) FROM orders) t2(num, den)
        UNION ALL
        SELECT 'contained(o_custkey)', num, den, num = den
        FROM (SELECT CAST((SELECT count(*) FROM orders
                 WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS BIGINT),
               CAST(count(o_custkey) AS BIGINT) FROM orders) t3(num, den)
        UNION ALL
        SELECT 'in_set(o_orderstatus)', num, den, num = den
        FROM (SELECT CAST(count(CASE WHEN o_orderstatus IN ('F','O') THEN 1 END) AS BIGINT),
                     CAST(count(o_orderstatus) AS BIGINT) FROM orders) t4(num, den)
        UNION ALL
        SELECT 'in_set(o_orderpriority)', num, den, num = den
        FROM (SELECT CAST(count(CASE WHEN o_orderpriority IN
                 ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                 THEN 1 END) AS BIGINT),
               CAST(count(o_orderpriority) AS BIGINT) FROM orders) t5(num, den)
        UNION ALL
        SELECT 'range(o_totalprice)', num, den, num = den
        FROM (SELECT CAST(count(CASE WHEN CAST(round(o_totalprice * 10000.0) AS BIGINT)
                 BETWEEN 0 AND 5000000000 THEN 1 END) AS BIGINT),
               CAST(count(o_totalprice) AS BIGINT) FROM orders) t6(num, den)""",

    "vector_wkt_info" -> (s"WITH $sqlFeats" +
      """ SELECT fid, klass, CAST(w * h AS DOUBLE) AS area,
          CAST(x0 AS DOUBLE) AS x_min, CAST(x0 + w AS DOUBLE) AS x_max,
          CAST(y0 AS DOUBLE) AS y_min, CAST(y0 + h AS DOUBLE) AS y_max
        FROM feats"""),

    "vector_extract_attr" -> (s"WITH $sqlFeats" +
      " SELECT fid, klass FROM feats WHERE klass IN ('c1', 'c3')"),

    "vector_dissolve" -> (s"WITH $sqlFeats" +
      """ SELECT klass, CAST(count(*) AS BIGINT) AS n_features,
          CAST(min(x0) AS DOUBLE) AS x_min, CAST(max(x0 + w) AS DOUBLE) AS x_max,
          CAST(min(y0) AS DOUBLE) AS y_min, CAST(max(y0 + h) AS DOUBLE) AS y_max,
          CAST(sum(w * h) AS DOUBLE) AS total_area
        FROM feats GROUP BY klass"""),

    "vector_dissolve_union" ->
      // exact rect-union area via slab sweep: x-slabs between consecutive
      // distinct x boundaries; per slab, union length of active
      // y-intervals (gaps-and-islands with a running max)
      """WITH feats AS (SELECT id, 'u' || CAST(id % 3 AS VARCHAR) AS klass,
           CAST((id % 10) * 3 AS INTEGER) AS x0, CAST((id // 10) * 2 AS INTEGER) AS y0,
           4 AS w, 3 AS h FROM range(60) t(id)),
        bounds AS (SELECT DISTINCT klass, x0 AS x FROM feats
          UNION SELECT DISTINCT klass, x0 + w FROM feats),
        slabs AS (SELECT klass, x AS xs,
            lead(x) OVER (PARTITION BY klass ORDER BY x) AS xe FROM bounds),
        active AS (SELECT s.klass, s.xs, s.xe, f.y0, f.y0 + f.h AS y1
          FROM slabs s JOIN feats f
            ON f.klass = s.klass AND f.x0 <= s.xs AND f.x0 + f.w >= s.xe
          WHERE s.xe IS NOT NULL),
        sw AS (SELECT klass, xs, xe, y0, y1,
            max(y1) OVER (PARTITION BY klass, xs ORDER BY y0, y1
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          FROM active),
        contrib AS (SELECT klass, xs, xe,
            GREATEST(y1 - GREATEST(y0, COALESCE(prev_max, y0)), 0) AS len
          FROM sw)
        SELECT c.klass, f.n_features,
          CAST(CAST(sum((c.xe - c.xs) * c.len) AS BIGINT) AS DOUBLE) AS union_area,
          f.x_min, f.x_max, f.y_min, f.y_max
        FROM contrib c JOIN (
          SELECT klass, CAST(count(*) AS BIGINT) AS n_features,
            CAST(min(x0) AS DOUBLE) AS x_min, CAST(max(x0 + w) AS DOUBLE) AS x_max,
            CAST(min(y0) AS DOUBLE) AS y_min, CAST(max(y0 + h) AS DOUBLE) AS y_max
          FROM feats GROUP BY klass) f USING (klass)
        GROUP BY c.klass, f.n_features, f.x_min, f.x_max, f.y_min, f.y_max""",

    "vector_dissolve_union_general" ->
      // closed form: 20 diamonds of area 2r²=18, 19 adjacent overlaps of
      // (2r−d)²/2 = 2 → 322; one ring of 20 tops + 20 bottoms + 2
      // extremes + 38 pinch intersections = 80 vertices; bbox [−3,79]×[−3,3]
      """SELECT 'u' || CAST(k AS VARCHAR) AS klass,
          CAST(20 AS BIGINT) AS n_features, CAST(322 AS DOUBLE) AS union_area,
          CAST(1 AS BIGINT) AS n_rings, CAST(80 AS BIGINT) AS n_vertices,
          CAST(-3 AS DOUBLE) AS x_min, CAST(79 AS DOUBLE) AS x_max,
          CAST(-3 AS DOUBLE) AS y_min, CAST(3 AS DOUBLE) AS y_max
        FROM range(3) t(k)""",

    "vector_join_intersect" -> (s"WITH $sqlFeats, $sqlQueries" +
      """ SELECT q.qid, CAST(count(*) AS BIGINT) AS n_feats,
          min(f.fid) AS min_fid, max(f.fid) AS max_fid
        FROM feats f JOIN qs q
          ON f.x0 <= q.x0 + q.w AND f.x0 + f.w >= q.x0
          AND f.y0 <= q.y0 + q.h AND f.y0 + f.h >= q.y0
        GROUP BY 1"""),

    "vector_multipart" ->
      """SELECT id AS fid,
         CAST(CASE WHEN id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS n_parts
       FROM range(50) t(id)""",

    "vector_extent" -> (s"WITH $sqlFeats" +
      """ SELECT CAST(min(x0) AS DOUBLE) AS x_min, CAST(max(x0 + w) AS DOUBLE) AS x_max,
          CAST(min(y0) AS DOUBLE) AS y_min, CAST(max(y0 + h) AS DOUBLE) AS y_max,
          CAST((max(x0 + w) - min(x0)) * (max(y0 + h) - min(y0)) AS DOUBLE) AS area
        FROM feats"""),

    "vector_reset_fids" -> (s"WITH $sqlFeats" +
      """ SELECT fid AS old_fid,
          CAST(row_number() OVER (ORDER BY fid) - 1 AS INTEGER) AS fid,
          CAST(row_number() OVER (ORDER BY fid) - 1 AS INTEGER) AS fid_attr,
          klass
        FROM feats WHERE klass IN ('c2', 'c4')"""),

    "vector_convert_multitype" -> (s"WITH $sqlFeats" +
      // exact string mirror of Wkt.toWkt's double formatting wrapped in
      // the multi-type: DuckDB CAST(DOUBLE AS VARCHAR) prints '4.0' like
      // Java Double.toString for these small integral coords
      """, d AS (SELECT fid,
           CAST(CAST(x0 AS DOUBLE) AS VARCHAR) AS xs,
           CAST(CAST(y0 AS DOUBLE) AS VARCHAR) AS ys,
           CAST(CAST(x0 + w AS DOUBLE) AS VARCHAR) AS x1,
           CAST(CAST(y0 + h AS DOUBLE) AS VARCHAR) AS y1
         FROM feats)
        SELECT fid, 'MULTIPOLYGON' AS geom_type,
          'MULTIPOLYGON (((' || xs || ' ' || ys || ', ' || x1 || ' ' || ys || ', '
            || x1 || ' ' || y1 || ', ' || xs || ' ' || y1 || ', ' || xs || ' ' || ys
            || ')))' AS conv_wkt
        FROM d"""),

    "raster_cast" -> (sqlPx +
      """ SELECT x, y, band,
          CAST(GREATEST(0.0, LEAST(255.0, ROUND(v * 3.5 - 39.75))) AS DOUBLE) AS v
        FROM px"""),

    "vector_fix_geometry" ->
      """WITH feats AS (SELECT id AS fid,
           CAST(id % 3 + 2 AS INTEGER) AS w, CAST(id % 4 + 1 AS INTEGER) AS h
         FROM range(120) t(id))
        SELECT fid, fid % 4 = 0 AS was_valid, CAST(1 AS BIGINT) AS n_rings,
          CAST(4 AS BIGINT) AS n_pts, CAST(w * h AS DOUBLE) AS area
        FROM feats""",

    "vector_join_concave" ->
      // each L decomposes into two rects; closed-set intersects(L, q) ⇔
      // either rect overlaps q
      """WITH lf AS (SELECT id AS fid, CAST((id % 10) * 6 AS INTEGER) AS x0,
           CAST((id // 10) * 8 AS INTEGER) AS y0 FROM range(80) t(id)),
        rects AS (SELECT fid, x0, y0, x0 + 4 AS x1, y0 + 2 AS y1 FROM lf
          UNION ALL SELECT fid, x0, y0 + 2, x0 + 2, y0 + 6 FROM lf),
        qs AS (SELECT id AS qid, CAST(id * 8 AS INTEGER) AS x0,
           CAST(id * 4 AS INTEGER) AS y0, 6 AS w, 7 AS h FROM range(10) t(id)),
        hits AS (SELECT DISTINCT q.qid, r.fid FROM rects r JOIN qs q
          ON r.x0 <= q.x0 + q.w AND r.x1 >= q.x0
          AND r.y0 <= q.y0 + q.h AND r.y1 >= q.y0)
        SELECT qid, CAST(count(*) AS BIGINT) AS n_feats,
          min(fid) AS min_fid, max(fid) AS max_fid
        FROM hits GROUP BY qid""",

    // --- clip / erase / buffer / reproject (round 3) ---
    "vector_clip" -> (s"WITH $sqlFeats" +
      s""" SELECT f.fid, CAST(c.cid AS BIGINT) AS clip_id,
          CAST((LEAST(f.x0 + f.w, c.cx1) - GREATEST(f.x0, c.cx0))
             * (LEAST(f.y0 + f.h, c.cy1) - GREATEST(f.y0, c.cy0)) AS DOUBLE) AS clip_area,
          CAST(1 AS BIGINT) AS n_rings, CAST(4 AS BIGINT) AS n_pts,
          CAST(GREATEST(f.x0, c.cx0) AS DOUBLE) AS x_min,
          CAST(LEAST(f.x0 + f.w, c.cx1) AS DOUBLE) AS x_max,
          CAST(GREATEST(f.y0, c.cy0) AS DOUBLE) AS y_min,
          CAST(LEAST(f.y0 + f.h, c.cy1) AS DOUBLE) AS y_max
        FROM feats f JOIN $sqlClipZones
          ON LEAST(f.x0 + f.w, c.cx1) > GREATEST(f.x0, c.cx0)
          AND LEAST(f.y0 + f.h, c.cy1) > GREATEST(f.y0, c.cy0)"""),

    "vector_erase" -> (s"WITH $sqlFeats" +
      """ SELECT fid, CAST(w * h
          - GREATEST(LEAST(x0 + w, 40) - GREATEST(x0, 10), 0)
          * GREATEST(LEAST(y0 + h, 30) - GREATEST(y0, 0), 0) AS DOUBLE) AS erase_area
        FROM feats"""),

    "vector_buffer" -> (s"WITH $sqlFeats" +
      """ SELECT fid, CAST(fid % 3 + 1 AS DOUBLE) AS dist,
          CAST((w + 2 * (fid % 3 + 1)) * (h + 2 * (fid % 3 + 1)) AS DOUBLE) AS buf_area,
          CAST(1 AS BIGINT) AS n_rings, CAST(4 AS BIGINT) AS n_pts,
          CAST(x0 - (fid % 3 + 1) AS DOUBLE) AS x_min,
          CAST(x0 + w + (fid % 3 + 1) AS DOUBLE) AS x_max,
          CAST(y0 - (fid % 3 + 1) AS DOUBLE) AS y_min,
          CAST(y0 + h + (fid % 3 + 1) AS DOUBLE) AS y_max
        FROM feats"""),

    "vector_buffer_round" -> (s"WITH $sqlFeats" +
      """ SELECT fid,
          ROUND(CAST(w * h AS DOUBLE) + 2.0 * 2.0 * (w + h)
            + 2 * 2 * 2.0 * 2.0 * sin(pi() / 4.0), 6) AS buf_area_r,
          CAST(1 AS BIGINT) AS n_rings
        FROM feats"""),

    "vector_reproject" -> (s"WITH $sqlFeats" +
      """ SELECT fid, CAST(1 AS BIGINT) AS n_rings, CAST(5 AS BIGINT) AS n_pts,
          6378137.0 * radians(CAST(x0 AS DOUBLE)) AS x_min,
          6378137.0 * radians(CAST(x0 + w AS DOUBLE)) AS x_max,
          6378137.0 * ln(tan(pi() / 4.0 + radians(CAST(y0 AS DOUBLE)) / 2.0)) AS y_min,
          6378137.0 * ln(tan(pi() / 4.0 + radians(CAST(y0 + h AS DOUBLE)) / 2.0)) AS y_max
        FROM feats"""),

    "vector_split_attr" -> (s"WITH $sqlFeats" +
      """ SELECT klass, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(fid) AS BIGINT) AS fid_sum,
          CAST(sum(x0) AS BIGINT) AS x0_sum
        FROM feats GROUP BY klass"""),

    "vector_shapes" ->
      // closed-form metrics of the L-shape (rect W×H minus top-right
      // NW×NH notch): area = WH−NWNH; perimeter = 2(W+H) (rectilinear);
      // hull = bbox cut by the notch diagonal; centroid by rect-minus-
      // notch decomposition. The engine derives the same numbers from
      // the WKT via general algorithms — an independent cross-check.
      """WITH lsh AS (SELECT id AS fid,
           CAST((id % 20) * 8 AS INTEGER) AS x0,
           CAST((id // 20) * 10 AS INTEGER) AS y0,
           CAST(id % 4 + 2 AS INTEGER) AS w,
           CAST(id % 6 + 2 AS INTEGER) AS h,
           CAST(1 + id % (id % 4 + 1) AS INTEGER) AS nw,
           CAST(1 + id % (id % 6 + 1) AS INTEGER) AS nh
         FROM range(200) t(id)),
        m AS (SELECT fid, x0, y0, w, h, nw, nh,
           CAST(w*h - nw*nh AS DOUBLE) AS area,
           CAST(2*(w+h) AS DOUBLE) AS perimeter,
           w*h - nw*nh/2.0 AS hull_area,
           CAST(2*w + 2*h - nw - nh AS DOUBLE) + sqrt(CAST(nw*nw + nh*nh AS DOUBLE)) AS hull_peri
         FROM lsh),
        m2 AS (SELECT *,
           4.0*pi()*area/(perimeter*perimeter) AS ipq,
           area/hull_area AS hull_ratio FROM m)
        SELECT fid, area, perimeter,
          ROUND(ipq, 9) AS ipq_r,
          hull_area,
          ROUND(hull_peri, 9) AS hull_peri_r,
          hull_ratio,
          ROUND(sqrt(hull_ratio * ipq), 9) AS compactness_r,
          (w*h*(x0 + w/2.0) - nw*nh*((x0 + w) - nw/2.0)) / (w*h - nw*nh) AS centroid_x,
          (w*h*(y0 + h/2.0) - nw*nh*((y0 + h) - nh/2.0)) / (w*h - nw*nh) AS centroid_y
        FROM m2""",

    "vector_attr_edit" -> (s"WITH $sqlFeats, " +
      """upd AS (SELECT id AS ufid, 'u' || CAST(id % 3 AS VARCHAR) AS uklass,
           'edited' AS unote FROM range(10) t(id))
         SELECT fid, COALESCE(uklass, klass) AS klass, x0, y0,
           CAST(NULL AS DOUBLE) AS score, unote AS note
         FROM feats LEFT JOIN upd ON fid = ufid"""),

    "vector_hexgrid" -> {
      val size = 2.0
      val sx = 1.5 * size
      val sy = math.sqrt(3.0) * size
      val hh = sy * 0.5
      val half = size * 0.5
      // extent (0,30)x(0,20): q in [0,10], r in [-1,6] before center filter
      s"""WITH g AS (SELECT a.q, b.r FROM range(0, 11) a(q), range(-1, 7) b(r)),
        c AS (SELECT q, r, CAST(q AS DOUBLE) * $sx AS cx,
          (CAST(r AS DOUBLE) + 0.5 * CAST((q % 2 + 2) % 2 AS DOUBLE)) * $sy AS cy
        FROM g)
        SELECT q, r, cx, cy,
          'POLYGON((' || (cx + $size) || ' ' || cy || ', '
            || (cx + $half) || ' ' || (cy + $hh) || ', '
            || (cx - $half) || ' ' || (cy + $hh) || ', '
            || (cx - $size) || ' ' || cy || ', '
            || (cx - $half) || ' ' || (cy - $hh) || ', '
            || (cx + $half) || ' ' || (cy - $hh) || ', '
            || (cx + $size) || ' ' || cy || '))' AS wkt
        FROM c
        WHERE cx >= 0.0 AND cx <= 30.0 AND cy >= 0.0 AND cy <= 20.0"""
    },

    "vector_loc_contains" -> (s"WITH $sqlFeats" + sqlFeatWkt +
      """ SELECT fid, wkt FROM fw
        WHERE (x0 <= 4.25 AND x0 + w >= 4.5 AND y0 <= 0.25 AND y0 + h >= 0.5)
           OR (x0 <= 16.5 AND x0 + w >= 17.0 AND y0 <= 10.25 AND y0 + h >= 10.75)"""),

    "vector_loc_within" -> (s"WITH $sqlFeats" + sqlFeatWkt +
      """ SELECT fid, wkt FROM fw
        WHERE x0 >= 0 AND x0 + w <= 30 AND y0 >= 0 AND y0 + h <= 20"""),

    "vector_loc_within_anti" -> (s"WITH $sqlFeats" + sqlFeatWkt +
      """ SELECT fid, wkt FROM fw
        WHERE NOT (x0 >= 0 AND x0 + w <= 30 AND y0 >= 0 AND y0 + h <= 20)"""),

    "vector_loc_touches" -> (s"WITH $sqlFeats" + sqlFeatWkt +
      // closed-set intersect with band y∈[-2,0] but zero-area overlap:
      // features sit at y0 >= 0, so touching ⟺ y0 = 0 (x ranges overlap:
      // x0 ∈ [0,76] ⊂ [0,80] always)
      """ SELECT fid, wkt FROM fw WHERE y0 = 0"""),

    "vector_loc_overlaps" -> (s"WITH $sqlFeats" + sqlFeatWkt +
      // strict interior overlap with band x∈[2,50], y∈[2,3], neither side
      // contained (the band is never inside a feature nor vice versa)
      """ SELECT fid, wkt FROM fw
        WHERE LEAST(x0 + w, 50) - GREATEST(x0, 2) > 0
          AND LEAST(y0 + h, 3) - GREATEST(y0, 2) > 0"""),

    "select_stratified" ->
      """WITH u AS (SELECT doc_id, lang,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
             / 1152921504606846976.0 AS h
         FROM documents),
        m AS (SELECT CAST(min(cnt) AS BIGINT) AS n FROM
          (SELECT count(*) AS cnt FROM documents GROUP BY lang)),
        rn AS (SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM u)
        SELECT doc_id, lang FROM rn, m WHERE rn <= n""",

    "select_mix" ->
      // same double arithmetic in the same order as sampleToMix:
      // m = min(n/t), keep_p = m * t / n, draw = md5-u01 < keep_p
      """WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY lang),
        t(lang, tgt) AS (VALUES
          ('de', CAST(0.2 AS DOUBLE)), ('en', CAST(0.4 AS DOUBLE)),
          ('es', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.2 AS DOUBLE))),
        j AS (SELECT c.lang, c.n, t.tgt FROM counts c JOIN t ON c.lang = t.lang),
        m AS (SELECT MIN(CAST(n AS DOUBLE) / tgt) AS m FROM j),
        rates AS (SELECT lang, (SELECT m FROM m) * tgt / CAST(n AS DOUBLE) AS keep_p FROM j)
        SELECT d.doc_id, d.lang, r.keep_p
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
            / 1152921504606846976.0 < r.keep_p""",

    "select_systematic" ->
      // one global ordered window is fine oracle-side; the engine's
      // bucketed prefix sum is identical by associativity. // mirrors div
      """WITH sized AS (SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS w
           FROM documents
           WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
         c AS (SELECT doc_id, w,
             COALESCE(SUM(w) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0,
             SUM(w) OVER () AS tw
           FROM sized)
         SELECT doc_id, w,
           CAST(((cum0 + w) * 100) // tw - (cum0 * 100) // tw AS BIGINT)
             AS n_copies
         FROM c
         WHERE ((cum0 + w) * 100) // tw - (cum0 * 100) // tw >= 1""",

    "split_by_hash" ->
      """WITH b AS (SELECT
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bkt
         FROM documents)
        SELECT CASE WHEN bkt < 80 THEN 'train'
                    WHEN bkt < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1""",

    "select_split" ->
      """WITH u AS (SELECT doc_id,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
             / 1152921504606846976.0 AS h
         FROM documents)
        SELECT doc_id,
          CASE WHEN h < 1.0 - 0.1 - 0.1 THEN 'train'
               WHEN h < 1.0 - 0.1 THEN 'val'
               ELSE 'test' END AS split
        FROM u""",

    // --- AI augmentation + masking (round 3) ---
    "aug_rot90" -> (sqlPxConv +
      """ SELECT x, y, band, CAST(((95 - y) * 7 + x * 13 + band * 5) % 97 AS DOUBLE) AS v
        FROM px"""),

    "aug_mirror" -> (sqlPxConv +
      """ SELECT x, y, band,
          CAST(((95 - x) * 7 + (95 - y) * 13 + band * 5) % 97 AS DOUBLE) AS v
        FROM px"""),

    "aug_rot_patch" -> (sqlPxConv +
      s""", t AS (SELECT x, y, band, x // 32 AS tx, y // 32 AS ty,
          x - 32 * (x // 32) AS lc, y - 32 * (y // 32) AS lr FROM px),
        kk AS (SELECT *, 1 + LEAST(CAST(FLOOR((${u01Sql(7, "tx", "ty", "0")}) * 3)
          AS INTEGER), 2) AS k FROM t)
        SELECT x, y, band, CAST((
          (CASE k WHEN 1 THEN tx * 32 + 31 - lr
                  WHEN 2 THEN tx * 32 + 31 - lc
                  ELSE tx * 32 + lr END) * 7
          + (CASE k WHEN 1 THEN ty * 32 + lc
                    WHEN 2 THEN ty * 32 + 31 - lr
                    ELSE ty * 32 + 31 - lc END) * 13
          + band * 5) % 97 AS DOUBLE) AS v
        FROM kk"""),

    "aug_mirror_patch" -> (sqlPxConv +
      s""", t AS (SELECT x, y, band, x // 32 AS tx, y // 32 AS ty,
          x - 32 * (x // 32) AS lc, y - 32 * (y // 32) AS lr FROM px),
        kk AS (SELECT *, 1 + LEAST(CAST(FLOOR((${u01Sql(11, "tx", "ty", "1")}) * 3)
          AS INTEGER), 2) AS k FROM t)
        SELECT x, y, band, CAST((
          (CASE WHEN k IN (1, 3) THEN tx * 32 + 31 - lc ELSE x END) * 7
          + (CASE WHEN k IN (2, 3) THEN ty * 32 + 31 - lr ELSE y END) * 13
          + band * 5) % 97 AS DOUBLE) AS v
        FROM kk"""),

    "aug_noise_uniform" -> (sqlPxConv +
      s""" SELECT x, y, band,
          v + (-((${u01Sql(42, "x // 32", "y // 32", "0")}) * 0.5)
            + 2 * ((${u01Sql(42, "x // 32", "y // 32", "0")}) * 0.5)
              * (${u01Sql(42, "x", "y", "1000 + band")})) AS v
        FROM px"""),

    "aug_channel_scale" -> (sqlPxConv +
      s""" SELECT x, y, band,
          v + (-((${u01Sql(3, "x // 32", "y // 32", "0")}) * 0.5)
            + 2 * ((${u01Sql(3, "x // 32", "y // 32", "0")}) * 0.5)
              * (${u01Sql(3, "x // 32", "y // 32", "100 + band")})) AS v
        FROM px"""),

    "aug_label_smooth" -> (sqlPxConv +
      """, tl AS (SELECT x, y, band, v,
          avg(v) OVER (PARTITION BY band, x // 32, y // 32) AS m FROM px)
        SELECT x, y, band, (1.0 - 0.1) * v + 0.1 * m AS v FROM tl"""),

    "aug_mixup" -> (sqlPxConv +
      s""", lam AS (SELECT DISTINCT x // 32 AS tx, y // 32 AS ty,
          LEAST(0.333 + (${u01Sql(21, "x // 32", "y // 32", "0")})
            * (0.666 + 0.001 - 0.333), 1.0) AS l FROM px)
        SELECT p.x, p.y, p.band, p.v * m.l + ($sqlMixV) * (1.0 - m.l) AS v
        FROM px p JOIN lam m ON p.x // 32 = m.tx AND p.y // 32 = m.ty"""),

    "aug_cutmix" -> (sqlPxConv +
      s""", box AS (SELECT DISTINCT x // 32 AS tx, y // 32 AS ty,
          10 + CAST(FLOOR((${u01Sql(33, "x // 32", "y // 32", "1")}) * 11) AS INTEGER) AS ph,
          10 + CAST(FLOOR((${u01Sql(33, "x // 32", "y // 32", "2")}) * 11) AS INTEGER) AS pw
          FROM px),
        box2 AS (SELECT tx, ty, ph, pw,
          CAST(FLOOR((${u01Sql(33, "tx", "ty", "3")}) * (32 - pw)) AS INTEGER) AS x0,
          CAST(FLOOR((${u01Sql(33, "tx", "ty", "4")}) * (32 - ph)) AS INTEGER) AS y0
          FROM box)
        SELECT p.x, p.y, p.band,
          CASE WHEN p.y - 32 * b.ty >= b.y0 AND p.y - 32 * b.ty < b.y0 + b.ph
                AND p.x - 32 * b.tx >= b.x0 AND p.x - 32 * b.tx < b.x0 + b.pw
               THEN ($sqlMixV) ELSE p.v END AS v
        FROM px p JOIN box2 b ON p.x // 32 = b.tx AND p.y // 32 = b.ty"""),

    "aug_mask_pixels" -> (sqlPxConv +
      s""" SELECT x, y, band,
          CASE WHEN (${u01Sql(7, "x", "y", "3000")}) > 0.05
               THEN 1.0 ELSE 0.0 END AS v
        FROM px"""),

    "aug_contrast" -> (sqlPxConv +
      s""", tl AS (SELECT x, y, band, v,
          avg(v) OVER (PARTITION BY band, x // 32, y // 32) AS m FROM px)
        SELECT x, y, band,
          (v - m) * (1.0 + (${u01Sql(9, "x // 32", "y // 32", "0")}) * 0.3) + m AS v
        FROM tl"""),

    "aug_encode_position" -> (sqlPxConv +
      """ SELECT x, y, 0 AS band, ROUND(CAST(y AS DOUBLE) / 95.0, 9) AS v_r
          FROM px WHERE band = 0
        UNION ALL
        SELECT x, y, 1 AS band,
          ROUND((sin(2.0 * pi() * (CAST(x AS DOUBLE) / 95.0)) + 1.0) / 2.0, 9) AS v_r
          FROM px WHERE band = 0
        UNION ALL
        SELECT x, y, 2 AS band,
          ROUND((cos(2.0 * pi() * (CAST(x AS DOUBLE) / 95.0)) + 1.0) / 2.0, 9) AS v_r
          FROM px WHERE band = 0"""),

    "aug_mask_rect" -> (sqlPxConv +
      s""", box AS (SELECT DISTINCT x // 32 AS tx, y // 32 AS ty,
          3 + CAST(FLOOR((${u01Sql(17, "x // 32", "y // 32", "5001")}) * 14) AS INTEGER) AS mh,
          3 + CAST(FLOOR((${u01Sql(17, "x // 32", "y // 32", "5002")}) * 14) AS INTEGER) AS mw
          FROM px),
        box2 AS (SELECT tx, ty, mh, mw,
          CAST(FLOOR((${u01Sql(17, "tx", "ty", "5003")}) * (32 - mh + 1)) AS INTEGER) AS y0,
          CAST(FLOOR((${u01Sql(17, "tx", "ty", "5004")}) * (32 - mw + 1)) AS INTEGER) AS x0
          FROM box)
        SELECT p.x, p.y, p.band,
          CASE WHEN p.y - 32 * b.ty >= b.y0 AND p.y - 32 * b.ty < b.y0 + b.mh
                AND p.x - 32 * b.tx >= b.x0 AND p.x - 32 * b.tx < b.x0 + b.mw
               THEN 0.0 ELSE 1.0 END AS v
        FROM px p JOIN box2 b ON p.x // 32 = b.tx AND p.y // 32 = b.ty"""),

    "raster_convolve_variance" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band,
          (sum(b.v * b.v) - sum(b.v) * sum(b.v) / count(*)) / count(*) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY 1, 2, 3"""),

    "raster_convolve_mode" -> (sqlPxConv +
      """, freq AS (SELECT a.x, a.y, a.band, b.v, count(*) AS cnt
          FROM px a JOIN px b
            ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
          GROUP BY 1, 2, 3, 4),
        ranked AS (SELECT x, y, band, v,
          row_number() OVER (PARTITION BY x, y, band ORDER BY cnt DESC, v ASC) AS rn
          FROM freq)
        SELECT x, y, band, v FROM ranked WHERE rn = 1"""),

    "raster_rasterize" -> (sqlPx.replace("range(2) r3(b)", "range(1) r3(b)") +
      s""" SELECT x, y, band, CAST(min(zone) AS DOUBLE) AS v
        FROM px JOIN $sqlZones
          ON gx >= zx0 AND gx <= zx1 AND gy >= zy0 AND gy <= zy1
        GROUP BY 1, 2, 3"""),

    "raster_band_select" -> (sqlPx +
      """ SELECT CAST(x // 64 AS INTEGER) AS cell_x, CAST(y // 64 AS INTEGER) AS cell_y,
          band, min(v) AS vmin, max(v) AS vmax,
          CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS vsum, CAST(count(*) AS BIGINT) AS n_px
        FROM px WHERE band = 1 GROUP BY 1, 2, 3"""),

    "raster_distance" ->
      """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           0 AS band, CAST((x*7 + y*13) % 97 AS DOUBLE) AS v
         FROM range(96) r1(x), range(96) r2(y))
        SELECT a.x, a.y, a.band,
          CAST(COALESCE(min(CASE WHEN b.v = 0
            THEN GREATEST(ABS(b.x - a.x), ABS(b.y - a.y)) END), 4) AS DOUBLE) AS v
        FROM px a LEFT JOIN px b
          ON b.x BETWEEN a.x - 3 AND a.x + 3 AND b.y BETWEEN a.y - 3 AND a.y + 3
        GROUP BY 1, 2, 3""",

    "raster_distance_euclid" ->
      // min Euclidean offset distance ≤ 3.0 to a zero pixel (the sorted
      // first-hit of the engine IS the min); 3.0 fill, 0 at targets
      """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           0 AS band, CAST((x*7 + y*13) % 97 AS DOUBLE) AS v
         FROM range(96) r1(x), range(96) r2(y))
        SELECT a.x, a.y, a.band,
          CASE WHEN a.v = 0 THEN 0.0
               ELSE CAST(COALESCE(min(CASE WHEN b.v = 0
                   AND NOT (b.x = a.x AND b.y = a.y)
                   AND sqrt(CAST((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) AS DOUBLE)) <= 3.0
                 THEN sqrt(CAST((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) AS DOUBLE)) END), 3.0)
                 AS DOUBLE) END AS v
        FROM px a LEFT JOIN px b
          ON b.x BETWEEN a.x - 3 AND a.x + 3 AND b.y BETWEEN a.y - 3 AND a.y + 3
        GROUP BY a.x, a.y, a.band, a.v""",

    // the engine must DISCOVER the region structure; the oracle states
    // the closed-form survivors (sub-threshold islands → background 0)
    "raster_sieve" ->
      """SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y, 0 AS band,
          CASE WHEN x BETWEEN 70 AND 78 AND y BETWEEN 60 AND 67 THEN 14.0
               WHEN x <= 2 AND y >= 90 THEN 15.0
               ELSE 0.0 END AS v
        FROM range(96) r1(x), range(96) r2(y)""",
    // nearest-rank inverse-CDF∘CDF in exact integer rank arithmetic
    "raster_hist_match" ->
      """WITH s AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST((x*7 + y*13) % 97 AS DOUBLE) AS v
         FROM range(96) r1(x), range(96) r2(y)),
        r AS (SELECT CAST((x*5 + y*11) % 61 AS DOUBLE) AS w
         FROM range(96) r1(x), range(96) r2(y)),
        sh AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY v),
        scum AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM sh),
        rh AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY w),
        rcum AS (SELECT w, SUM(n) OVER (ORDER BY w) AS rcum FROM rh),
        tot AS (SELECT (SELECT sum(n) FROM sh) AS srcn,
                       (SELECT sum(n) FROM rh) AS refn),
        mapping AS (SELECT sc.v, MIN(rc.w) AS mv
          FROM scum sc, rcum rc, tot
          WHERE rc.rcum * tot.srcn >= sc.cum * tot.refn
          GROUP BY sc.v)
        SELECT s.x, s.y, 0 AS band, m.mv AS v
        FROM s JOIN mapping m USING (v)""",
    // ZT quadric coefficients are exact dyadics (integer z, 2^-2 cell);
    // the directional forms repeat the engine's operation order verbatim
    "raster_curvature" ->
      """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           0 AS band, CAST((x*7 + y*13) % 97 AS DOUBLE) AS v
         FROM range(96) r1(x), range(96) r2(y)),
        n AS (SELECT a.x, a.y, a.band, a.v AS z5,
            COALESCE(MAX(CASE WHEN b.x = a.x-1 AND b.y = a.y-1 THEN b.v END), a.v) AS z1,
            COALESCE(MAX(CASE WHEN b.x = a.x   AND b.y = a.y-1 THEN b.v END), a.v) AS z2,
            COALESCE(MAX(CASE WHEN b.x = a.x+1 AND b.y = a.y-1 THEN b.v END), a.v) AS z3,
            COALESCE(MAX(CASE WHEN b.x = a.x-1 AND b.y = a.y   THEN b.v END), a.v) AS z4,
            COALESCE(MAX(CASE WHEN b.x = a.x+1 AND b.y = a.y   THEN b.v END), a.v) AS z6,
            COALESCE(MAX(CASE WHEN b.x = a.x-1 AND b.y = a.y+1 THEN b.v END), a.v) AS z7,
            COALESCE(MAX(CASE WHEN b.x = a.x   AND b.y = a.y+1 THEN b.v END), a.v) AS z8,
            COALESCE(MAX(CASE WHEN b.x = a.x+1 AND b.y = a.y+1 THEN b.v END), a.v) AS z9
          FROM px a LEFT JOIN px b
            ON b.x BETWEEN a.x-1 AND a.x+1 AND b.y BETWEEN a.y-1 AND a.y+1
          GROUP BY a.x, a.y, a.band, a.v),
        q AS (SELECT x, y, band,
            ((z4 + z6) / 2.0 - z5) / 0.0625 AS dD,
            ((z2 + z8) / 2.0 - z5) / 0.0625 AS eE,
            (-z1 + z3 + z7 - z9) / (4.0 * 0.0625) AS fF,
            (-z4 + z6) / (2.0 * 0.25) AS gG,
            (z2 - z8) / (2.0 * 0.25) AS hH
          FROM n)
        SELECT x, y, band, -2.0 * (dD + eE) * 100.0 AS curv,
          CASE WHEN gG*gG + hH*hH = 0.0 THEN 0.0
               ELSE -2.0 * (dD*gG*gG + eE*hH*hH + fF*gG*hH) / (gG*gG + hH*hH) * 100.0
               END AS prof,
          CASE WHEN gG*gG + hH*hH = 0.0 THEN 0.0
               ELSE 2.0 * (dD*hH*hH + eE*gG*gG - fF*gG*hH) / (gG*gG + hH*hH) * 100.0
               END AS planc
        FROM q""",
    // nearest-source id under the pinned (d², dy, dx) candidate order —
    // the same total order the engine's sorted-offset scan walks
    "raster_transect" ->
      // same DDA as the viewshed oracle over steps 0..88
      """WITH gs AS (SELECT CAST(i AS BIGINT) AS step,
           3 + (2*88*i + 88) // (2*88) AS x,
           7 + (2*48*i + 88) // (2*88) AS y
         FROM generate_series(0, 88) t(i))
        SELECT gs.step, CAST(gs.x AS INT) AS x, CAST(gs.y AS INT) AS y,
          0 AS band, CAST((gs.x*3 + gs.y*5) % 41 AS DOUBLE) AS v
        FROM gs""",

    "raster_zone_geom" ->
      // 4-neighbor perimeter via LEFT JOINs (off-raster counts), exact
      // integer compactness 16·area·10⁶ div P²
      """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST(((x // 12) * 31 + (y // 12) * 17) % 5 AS BIGINT) AS lab
         FROM range(96) r1(x), range(96) r2(y)),
        per AS (SELECT p.x, p.y, p.lab,
            (CASE WHEN e.lab IS NULL OR e.lab <> p.lab THEN 1 ELSE 0 END
           + CASE WHEN w.lab IS NULL OR w.lab <> p.lab THEN 1 ELSE 0 END
           + CASE WHEN s2.lab IS NULL OR s2.lab <> p.lab THEN 1 ELSE 0 END
           + CASE WHEN n2.lab IS NULL OR n2.lab <> p.lab THEN 1 ELSE 0 END) AS pc
          FROM px p
          LEFT JOIN px e ON e.x = p.x + 1 AND e.y = p.y
          LEFT JOIN px w ON w.x = p.x - 1 AND w.y = p.y
          LEFT JOIN px s2 ON s2.x = p.x AND s2.y = p.y + 1
          LEFT JOIN px n2 ON n2.x = p.x AND n2.y = p.y - 1)
        SELECT lab AS label, CAST(count(*) AS BIGINT) AS area,
          CAST(sum(pc) AS BIGINT) AS perimeter,
          CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
          CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max,
          CAST(count(*) * 16000000 // (sum(pc) * sum(pc)) AS BIGINT) AS compact_ppm
        FROM per GROUP BY lab""",

    "raster_viewshed" ->
      // same round-half-up DDA ray (floor division (2·d·i + n) // 2n)
      // and the (h_i−h_o)·n ≥ (h_t−h_o)·i blocker rule
      """WITH d AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST((x*3 + y*5) % 41 AS DOUBLE) AS v
         FROM range(96) r1(x), range(96) r2(y)),
        obs AS (SELECT 48 AS ox, 48 AS oy,
          (SELECT v FROM d WHERE x = 48 AND y = 48) + 10.0 AS ho),
        tg AS (SELECT d.x, d.y, d.v,
            greatest(abs(d.x - o.ox), abs(d.y - o.oy)) AS n, o.ox, o.oy, o.ho
          FROM d CROSS JOIN obs o),
        blk AS (SELECT t.x, t.y,
            bool_or((d2.v - t.ho) * t.n >= (t.v - t.ho) * gs.i) AS blocked
          FROM tg t
          JOIN generate_series(1, 19) gs(i) ON gs.i < t.n
          JOIN d d2 ON d2.x = t.ox + CASE WHEN t.x >= t.ox THEN 1 ELSE -1 END *
                   ((2*abs(t.x - t.ox)*gs.i + t.n) // (2*t.n))
                   AND d2.y = t.oy + CASE WHEN t.y >= t.oy THEN 1 ELSE -1 END *
                   ((2*abs(t.y - t.oy)*gs.i + t.n) // (2*t.n))
          WHERE t.n BETWEEN 2 AND 20
          GROUP BY t.x, t.y)
        SELECT t.x, t.y, 0 AS band,
          CASE WHEN t.n > 20 THEN 0.0
               WHEN COALESCE(b.blocked, false) THEN 0.0 ELSE 1.0 END AS v
        FROM tg t LEFT JOIN blk b ON b.x = t.x AND b.y = t.y""",

    "raster_allocation" ->
      """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           0 AS band,
           CASE WHEN (x*31 + y*17) % 193 = 0
                THEN CAST(x*256 + y + 1 AS DOUBLE) ELSE 0.0 END AS v
         FROM range(96) r1(x), range(96) r2(y)),
        src AS (SELECT x, y, v FROM px WHERE v <> 0),
        cand AS (SELECT p.x, p.y, s.v AS sv,
            (s.y - p.y)*(s.y - p.y) + (s.x - p.x)*(s.x - p.x) AS d2,
            s.y - p.y AS dy, s.x - p.x AS dx
          FROM px p JOIN src s
            ON s.x BETWEEN p.x - 12 AND p.x + 12
            AND s.y BETWEEN p.y - 12 AND p.y + 12
          WHERE (s.y - p.y)*(s.y - p.y) + (s.x - p.x)*(s.x - p.x) <= 144),
        best AS (SELECT x, y, sv,
            row_number() OVER (PARTITION BY x, y ORDER BY d2, dy, dx) AS rn
          FROM cand)
        SELECT p.x, p.y, p.band, COALESCE(b.sv, 0.0) AS v
        FROM px p LEFT JOIN best b ON b.x = p.x AND b.y = p.y AND b.rn = 1""",

    "raster_fill" ->
      """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           0 AS band,
           CASE WHEN (x*7 + y*13) % 97 = 0 THEN -9999.0
                ELSE CAST((x*7 + y*13) % 97 AS DOUBLE) END AS v
         FROM range(96) r1(x), range(96) r2(y))
        SELECT a.x, a.y, a.band,
          CASE WHEN a.v <> -9999.0 THEN a.v
               ELSE COALESCE(sum(b.v) FILTER (WHERE b.v <> -9999.0)
                 / count(*) FILTER (WHERE b.v <> -9999.0), -9999.0) END AS v
        FROM px a LEFT JOIN px b
          ON b.x BETWEEN a.x - 1 AND a.x + 1 AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band, a.v""",

    "raster_vectorize" ->
      // each diagonal stripe is exactly one 4-connected region, so the
      // per-region rows equal the per-value aggregates
      """WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           CAST((x + y) // 64 AS DOUBLE) AS v
         FROM range(256) r1(x), range(256) r2(y))
        SELECT 0 AS band, v,
          CAST(min(y * 256 + x) AS BIGINT) AS region_key,
          CAST(count(*) AS BIGINT) AS n_px,
          CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
          CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
        FROM px GROUP BY v""",

    "patch_factors" ->
      // same divisor scan + strict-< argmin as the reference loop:
      // score = |patch_aspect − target_aspect| + wasted-coverage fraction,
      // first (smallest hp) best wins
      """WITH combos AS (SELECT CAST(np AS INTEGER) AS np, w, h
           FROM range(1, 33) a(np),
             (VALUES (256,256),(100,64),(512,128),(64,512)) s(w, h)),
        cand AS (SELECT np, w, h, CAST(i AS INTEGER) AS hp,
            CAST(np // i AS INTEGER) AS wp,
            ABS((CAST(w AS DOUBLE) / (np // i)) / (CAST(h AS DOUBLE) / i)
                - CAST(w AS DOUBLE) / h)
            + (CAST(w AS DOUBLE) * h
               - (CAST(FLOOR(CAST(w AS DOUBLE) / (np // i)) AS BIGINT) * (np // i))
                 * (CAST(FLOOR(CAST(h AS DOUBLE) / i) AS BIGINT) * i))
              / (CAST(w AS DOUBLE) * h) AS score
          FROM combos, range(1, 33) b(i)
          WHERE i <= np AND np % i = 0),
        pick AS (SELECT np, w, h, hp, wp,
            row_number() OVER (PARTITION BY np, w, h ORDER BY score, hp) AS rn
          FROM cand)
        SELECT np AS num_patches, w AS width, h AS height,
          hp AS h_patches, wp AS w_patches
        FROM pick WHERE rn = 1""",

    "patch_offsets" ->
      // 100×64 into 6 patches (optimal 2×3 grid), overlap 4 → windows
      // grown by ceil(4/2)=2 and clamped to the image
      """WITH cand AS (SELECT CAST(i AS INTEGER) AS hp, CAST(6 // i AS INTEGER) AS wp,
            ABS((100.0 / (6 // i)) / (64.0 / i) - 100.0 / 64.0)
            + (6400.0 - (CAST(FLOOR(100.0 / (6 // i)) AS BIGINT) * (6 // i))
                        * (CAST(FLOOR(64.0 / i) AS BIGINT) * i)) / 6400.0 AS score
          FROM range(1, 7) b(i) WHERE 6 % i = 0),
        pick AS (SELECT hp, wp FROM cand ORDER BY score, hp LIMIT 1),
        grid AS (SELECT CAST(wi AS INTEGER) AS wi, CAST(hi AS INTEGER) AS hi,
            p.hp, p.wp
          FROM pick p, range(0, 8) a(wi), range(0, 8) c(hi)
          WHERE wi < p.wp AND hi < p.hp),
        base AS (SELECT
            wi * (100 // wp) AS x, hi * (64 // hp) AS y,
            (CASE WHEN wi = wp - 1 THEN 100
                  ELSE (wi + 1) * (100 // wp) END) - wi * (100 // wp) AS sx,
            (CASE WHEN hi = hp - 1 THEN 64
                  ELSE (hi + 1) * (64 // hp) END) - hi * (64 // hp) AS sy
          FROM grid)
        SELECT CAST(GREATEST(0, x - 2) AS INTEGER) AS x,
          CAST(GREATEST(0, y - 2) AS INTEGER) AS y,
          CAST(LEAST(sx + 2, 100 - GREATEST(0, x - 2)) AS INTEGER) AS size_x,
          CAST(LEAST(sy + 2, 64 - GREATEST(0, y - 2)) AS INTEGER) AS size_y
        FROM base""",

    "raster_vectorize_rings" ->
      // every 10×10 block (clipped at 256) is one 4-connected region with
      // a single rectangular ring; vertex order mirrors the tracer's
      // interior-on-left orientation rotated to the lexicographic min
      """WITH blk AS (SELECT bx, by,
           CAST(bx * 10 AS BIGINT) AS x0, CAST(LEAST(256, (bx + 1) * 10) AS BIGINT) AS x1,
           CAST(by * 10 AS BIGINT) AS y0, CAST(LEAST(256, (by + 1) * 10) AS BIGINT) AS y1
         FROM range(26) r1(bx), range(26) r2(by))
        SELECT 0 AS band, CAST((bx + by) % 3 AS DOUBLE) AS v,
          y0 * 256 + x0 AS region_key,
          (x1 - x0) * (y1 - y0) AS n_px,
          'POLYGON((' || x0 || ' ' || y0 || ',' || x1 || ' ' || y0 || ',' ||
            x1 || ' ' || y1 || ',' || x0 || ' ' || y1 || ',' ||
            x0 || ' ' || y0 || '))' AS wkt
        FROM blk""",

    "raster_zonal_binned_mode" ->
      (s"""WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
           0 AS band,
           CAST((x*7 + y*13) % 97 AS DOUBLE) + ((x*31 + y*17) % 101) / 101.0 AS v,
           0.0 + (x + 0.5) * 0.25 AS gx, 64.0 + (y + 0.5) * -0.25 AS gy
         FROM range(256) r1(x), range(256) r2(y)),
        zpx AS (SELECT zone, band, v FROM px JOIN $sqlZones
          ON gx >= zx0 AND gx <= zx1 AND gy >= zy0 AND gy <= zy1),
        rng AS (SELECT zone, band, min(v) AS vmin, max(v) AS vmax,
          CAST(count(*) AS BIGINT) AS n_px FROM zpx GROUP BY 1, 2),
        binned AS (SELECT z.zone, z.band,
          CASE WHEN r.vmax = r.vmin THEN 0
               ELSE LEAST(CAST(FLOOR((z.v - r.vmin) / (r.vmax - r.vmin) * 256) AS INTEGER), 255)
          END AS bin, CAST(count(*) AS BIGINT) AS cnt
          FROM zpx z JOIN rng r ON z.zone = r.zone AND z.band = r.band
          GROUP BY 1, 2, 3),
        top AS (SELECT zone, band, bin, cnt,
          row_number() OVER (PARTITION BY zone, band ORDER BY cnt DESC, bin ASC) AS rn
          FROM binned)
        SELECT CAST(t.zone AS BIGINT) AS zone, t.band, r.n_px, t.bin, t.cnt,
          r.vmin + (CAST(t.bin AS DOUBLE) + 0.5) * (r.vmax - r.vmin) / 256 AS mode_binned
        FROM top t JOIN rng r ON t.zone = r.zone AND t.band = r.band
        WHERE t.rn = 1"""),

    "raster_vectorize_rings_geo" ->
      // geotransform applied per vertex: gx = x*0.25, gy = 64 − y*0.25
      // (quarter-lattice doubles render identically in Scala and DuckDB)
      """WITH blk AS (SELECT bx, by,
           CAST(bx * 10 AS BIGINT) AS x0, CAST(LEAST(256, (bx + 1) * 10) AS BIGINT) AS x1,
           CAST(by * 10 AS BIGINT) AS y0, CAST(LEAST(256, (by + 1) * 10) AS BIGINT) AS y1
         FROM range(26) r1(bx), range(26) r2(by))
        SELECT 0 AS band, CAST((bx + by) % 3 AS DOUBLE) AS v,
          y0 * 256 + x0 AS region_key,
          (x1 - x0) * (y1 - y0) AS n_px,
          'POLYGON((' ||
            (0.0 + CAST(x0 AS DOUBLE) * 0.25) || ' ' || (64.0 + CAST(y0 AS DOUBLE) * -0.25) || ',' ||
            (0.0 + CAST(x1 AS DOUBLE) * 0.25) || ' ' || (64.0 + CAST(y0 AS DOUBLE) * -0.25) || ',' ||
            (0.0 + CAST(x1 AS DOUBLE) * 0.25) || ' ' || (64.0 + CAST(y1 AS DOUBLE) * -0.25) || ',' ||
            (0.0 + CAST(x0 AS DOUBLE) * 0.25) || ' ' || (64.0 + CAST(y1 AS DOUBLE) * -0.25) || ',' ||
            (0.0 + CAST(x0 AS DOUBLE) * 0.25) || ' ' || (64.0 + CAST(y0 AS DOUBLE) * -0.25) || '))' AS wkt
        FROM blk""",

    "scaler_minmax" ->
      """WITH s AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents)
        SELECT doc_id,
          (CAST(n_chars AS DOUBLE) - CAST(mn AS DOUBLE))
            / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) AS scaled
        FROM documents CROSS JOIN s""",

    "scaler_standardize" ->
      """WITH s AS (SELECT CAST(sum(n_chars) AS DOUBLE) AS sv,
           CAST(sum(n_chars * n_chars) AS DOUBLE) AS s2,
           CAST(count(*) AS DOUBLE) AS n FROM documents)
        SELECT doc_id,
          (CAST(n_chars AS DOUBLE) - sv / n)
            / sqrt((s2 - sv * sv / n) / n) AS z
        FROM documents CROSS JOIN s""",

    "scaler_mad" -> (scalerHistCtes +
      """ SELECT d.doc_id,
          (CAST(d.n_chars AS DOUBLE) - q.med) / (mq.mad * CAST(1.4826 AS DOUBLE)) AS z_mad
        FROM documents d CROSS JOIN q CROSS JOIN mq"""),

    "scaler_iqr" -> (scalerHistCtes +
      """ SELECT d.doc_id,
          (CAST(d.n_chars AS DOUBLE) - q.med) / (q.q3 - q.q1) AS z_iqr
        FROM documents d CROSS JOIN q"""),

    "scaler_range" ->
      """WITH s AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents)
        SELECT doc_id,
          (CAST(n_chars AS DOUBLE) - CAST(mn AS DOUBLE))
            / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) * 5.0 + 2.0 AS scaled
        FROM documents CROSS JOIN s""",

    "raster_sobel" -> sobelOracle,

    "raster_unsharp" -> (sqlPxConv +
      """ SELECT a.x, a.y, a.band, a.v + 0.5 * (a.v - sum(b.v) / count(*)) AS v
        FROM px a JOIN px b
          ON b.band = a.band AND b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1
        GROUP BY a.x, a.y, a.band, a.v"""),

    "raster_rgb_hsl" -> rgbHslOracle,

    "mm_channel_reorder" ->
      """SELECT e.vec_id, CAST(gs.i AS INTEGER) AS pos,
         CAST(round(CAST(e.embedding[((gs.i % 4) * 16) + ((gs.i - (gs.i % 4)) // 4) + 1]
           AS DOUBLE) * 1000.0) AS BIGINT) AS q
       FROM embeddings e, generate_series(0, 63) gs(i)""",

    "raster_predict_merge" -> predictOracle,

    "patch_merge_wmedian" ->
      """WITH preds AS (SELECT CAST(x_t.id % 64 AS INTEGER) AS x,
           CAST((x_t.id // 64) % 64 AS INTEGER) AS y,
           CAST((x_t.id // 4096) AS INTEGER) AS o
         FROM range(12288) x_t(id)),
        pv AS (SELECT x, y,
           CAST((x * 3 + y * 5 + o * o * 11) % 31 AS DOUBLE) AS v,
           CAST(o + 1 AS DOUBLE) AS weight FROM preds),
        cum AS (SELECT x, y, v, weight,
           sum(weight) OVER (PARTITION BY x, y ORDER BY v, weight
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
           sum(weight) OVER (PARTITION BY x, y) AS tw
         FROM pv)
        SELECT x, y, min(v) FILTER (WHERE cw * 2.0 >= tw) AS v_merged,
          CAST(count(*) AS BIGINT) AS n_preds
        FROM cum GROUP BY x, y""",

    "mm_image_decode" ->
      """WITH px AS (SELECT d.id, x.x, y.y
           FROM range(100) d(id), range(48) x(x), range(32) y(y))
        SELECT id AS doc_id, 48 AS width, 32 AS height, 3 AS channels,
          CAST(sum((x*7 + y*3 + id) % 256) AS BIGINT) AS ch0_sum,
          CAST(sum((x*5 + y*11 + 2*id) % 256) AS BIGINT) AS ch1_sum,
          CAST(sum((x*13 + y + 3*id) % 256) AS BIGINT) AS ch2_sum,
          CAST(0 AS BIGINT) AS ch3_sum
        FROM px GROUP BY id""",

    // palette formula replayed per pixel index — no GIF bytes anywhere
    // near the oracle, so a hash match certifies header walk + LZW +
    // palette expansion end to end
    "raster_tiff_roundtrip" ->
      """SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y, 0 AS band,
           CAST((x*7 + y*13) % 97 AS DOUBLE) AS v
         FROM range(96) r1(x), range(96) r2(y)""",

    "mm_tiff_decode" ->
      """WITH px AS (SELECT d.id, (x.x*5 + y.y*11 + d.id) % 256 AS v
           FROM range(100) d(id), range(32) x(x), range(24) y(y))
        SELECT id AS doc_id, 32 AS width, 24 AS height, 1 AS channels,
          CAST(sum(v) AS BIGINT) AS px_sum,
          CAST(id AS DOUBLE) AS origin_x, CAST(100 + id AS DOUBLE) AS origin_y,
          0.25 AS px_w, -0.25 AS px_h
        FROM px GROUP BY id""",

    "mm_gif_decode" ->
      """WITH px AS (SELECT d.id, (x.x*3 + y.y*7 + d.id) % 64 AS ci
           FROM range(100) d(id), range(40) x(x), range(30) y(y))
        SELECT id AS doc_id, 40 AS width, 30 AS height, 3 AS channels,
          CAST(sum((ci*37 + 11) % 256) AS BIGINT) AS ch0_sum,
          CAST(sum((ci*73 + 5) % 256) AS BIGINT) AS ch1_sum,
          CAST(sum((ci*151 + 99) % 256) AS BIGINT) AS ch2_sum,
          CAST(0 AS BIGINT) AS ch3_sum
        FROM px GROUP BY id""",

    "mm_audio_decode" ->
      """WITH s AS (SELECT d.id, i.i, ((i*37 + id*13) % 2001) - 1000 AS v
           FROM range(100) d(id), range(800) i(i)),
        lagged AS (SELECT id, i, v,
            lag(v) OVER (PARTITION BY id ORDER BY i) AS prev FROM s)
        SELECT id AS doc_id, 16000 AS sample_rate, 800 AS n_samples,
          CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
          CAST(max(abs(v)) AS INTEGER) AS max_abs,
          CAST(sum(CASE WHEN prev IS NOT NULL AND ((v >= 0) <> (prev >= 0))
                        THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
        FROM lagged GROUP BY id""",

    "mm_mp4_samples" ->
      """WITH f AS (SELECT d.id, si.si, j.j,
           (j*5 + si*17 + id*29) % 256 AS b
         FROM range(40) d(id), range(10) si(si), range(96) j(j)
         WHERE si % 2 = 0 AND j < 32 + (si % 4) * 8)
        SELECT id AS doc_id, CAST(si AS INTEGER) AS sample_idx,
          640 AS width, 360 AS height, 30000 AS timescale,
          10010 AS duration, CAST(32 + (si % 4) * 8 AS INTEGER) AS sample_bytes,
          CAST(sum(b) AS BIGINT) AS byte_sum
        FROM f GROUP BY id, si""",

    "mm_video_frames" ->
      """WITH f AS (SELECT d.id, fi.fi, j.j,
           (j*7 + fi*11 + id*13) % 256 AS b
         FROM range(40) d(id), range(12) fi(fi), range(64) j(j)
         WHERE fi % 3 = 0)
        SELECT id AS doc_id, CAST(fi AS INTEGER) AS frame_idx,
          320 AS width, 240 AS height, 33333 AS usec_per_frame,
          12 AS total_frames, 64 AS frame_bytes,
          CAST(sum(b) AS BIGINT) AS byte_sum
        FROM f GROUP BY id, fi""",

    "encode_latlng_roundtrip" -> Pages.sqlWith(
      // trig-free: the decode must return the input; only the exact -180
      // boundary folds to +180 (reference np.where semantics)
      """ SELECT doc_id, round(lat, 6) AS lat_rt,
         round(CASE WHEN lon = -180.0 THEN 180.0 ELSE lon END, 6) AS lng_rt
       FROM pages"""),

    "mm_features" -> Pages.sqlWith(
      " SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len, CAST(" +
        (1 to 16).map(i => s"COALESCE(ascii(substr(text, $i, 1)), 0)").mkString(" + ") +
        " AS BIGINT) AS head_sum FROM pages"),

    "events_hourly" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS win,
         event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents_sum,
         min(event_id) AS min_ev, max(event_id) AS max_ev
       FROM events GROUP BY 1, 2""",

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         g AS (SELECT user_id,
           CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
           FROM e)
        SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
          CAST(count(*) AS BIGINT) AS n_events
        FROM g GROUP BY user_id""",

    "events_retention" ->
      """WITH d AS (SELECT DISTINCT user_id,
            CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
         s AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_n FROM f GROUP BY 1),
         a AS (SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
                 CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_active
               FROM d JOIN f USING (user_id) GROUP BY 1, 2)
        SELECT a.cohort_day, a.day_offset, a.n_active,
          a.n_active * 1000000 // s.cohort_n AS ret_ppm
        FROM a JOIN s USING (cohort_day)""",

    "events_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         p AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
                 AS from_type, event_type AS to_type FROM e),
         c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
          CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
        FROM c""",

    "events_typestats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents_sum,
         CAST(sum(CAST(substr(props, 7, length(props) - 7) AS INTEGER)) AS BIGINT) AS k_sum,
         min(CAST(substr(props, 7, length(props) - 7) AS INTEGER)) AS k_min,
         max(CAST(substr(props, 7, length(props) - 7) AS INTEGER)) AS k_max
       FROM events GROUP BY 1"""
  )

  /** np.percentile('linear') from a cumulative value histogram, mirroring
    * Zonal.histQuantile's exact IEEE ops: pos = q·(n−1); value-at-index i
    * = min v with cum > i; interpolate when pos is fractional. Expects
    * rows (v, cnt, cume, n) grouped by zone/band.
    */
  private def histQuantileSql(q: String): String = {
    val pos = s"CAST($q AS DOUBLE) * (n - 1)"
    val flo = s"floor($pos)"
    def at(i: String) = s"min(v) FILTER (WHERE cume > $i)"
    s"""CASE WHEN $pos - $flo = 0 THEN ${at(flo)}
        ELSE ${at(flo)} + (${at(s"($flo) + 1")} - ${at(flo)}) * ($pos - $flo) END"""
  }

  /** Oracle for Selection.kCenters: the unrolled k-round farthest-point
    * CTE chain — round r computes every point's exact integer distance²
    * to center r−1, folds it into the running min, and takes the
    * (mind2 DESC, vec_id ASC) argmax as center r.
    */
  /** Shared CTE chain: q (quantized dims) + m0..m_{k-1} (the Gonzalez
    * farthest-point seeds with their covering radii).
    */
  private def kCentersChain(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """q AS (SELECT vec_id, d,
           CAST(ROUND(CAST(embedding[d + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS qv
         FROM embeddings, range(64) t(d)),
        m0 AS (SELECT min(vec_id) AS cid, CAST(0 AS BIGINT) AS r2 FROM embeddings)"""
    for (r <- 1 until k) {
      sb ++= s""",
        d$r AS (SELECT p.vec_id,
            CAST(SUM((p.qv - c.qv) * (p.qv - c.qv)) AS BIGINT) AS d2
          FROM q p JOIN m${r - 1} m ON TRUE
          JOIN q c ON c.vec_id = m.cid AND c.d = p.d
          GROUP BY p.vec_id),
        dist$r AS (SELECT a.vec_id, ${
        if (r == 1) "a.d2 AS mind2" else s"LEAST(p.mind2, a.d2) AS mind2"}
          FROM d$r a${if (r == 1) "" else s" JOIN dist${r - 1} p USING (vec_id)"}),
        m$r AS (SELECT vec_id AS cid, mind2 AS r2 FROM dist$r
          ORDER BY mind2 DESC, vec_id LIMIT 1)"""
    }
    sb.toString
  }

  private def kCentersOracle(k: Int): String =
    s"WITH ${kCentersChain(k)}" +
      (0 until k).map(r =>
        s"\n        SELECT CAST($r AS INTEGER) AS round, cid AS vec_id, r2 AS radius2 FROM m$r")
        .mkString("", "\n        UNION ALL", "")

  /** Oracle for Similarity.kMeans: the k-centers seed chain, then
    * `iters` unrolled Lloyd rounds — per-center exact integer cost
    * a_c = ‖n_c·p⃗ − s⃗_c‖², the assignment fold by HUGEINT
    * cross-multiplication (ties → lower index, the engine's fold
    * order), and centroid re-estimation as (Σqv, n) rows with the
    * emptied-cluster COALESCE keep-previous contract.
    */
  private def kMeansOracle(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH ${kCentersChain(k)}"
    sb ++= (0 until k).map(c =>
      s"""SELECT $c AS c, p.d, p.qv AS s, CAST(1 AS BIGINT) AS n
          FROM q p JOIN m$c m ON p.vec_id = m.cid""")
      .mkString(",\n        cent0 AS (", "\n          UNION ALL ", ")")
    for (t <- 1 to iters) {
      sb ++= s""",
        a$t AS (SELECT p.vec_id, ct.c,
            CAST(SUM((ct.n * p.qv - ct.s) * (ct.n * p.qv - ct.s)) AS BIGINT) AS a,
            MAX(ct.n) AS n
          FROM q p JOIN cent${t - 1} ct ON ct.d = p.d
          GROUP BY p.vec_id, ct.c),
        av$t AS (SELECT vec_id, ${(0 until k).map(c =>
        s"MAX(CASE WHEN c = $c THEN a END) AS a$c, MAX(CASE WHEN c = $c THEN n END) AS n$c")
        .mkString(",\n            ")}
          FROM a$t GROUP BY vec_id)"""
      // pairwise fold: f{t}_1 .. f{t}_{k-1}
      for (c <- 1 until k) {
        val (pb, pa, pn) =
          if (c == 1) ("0", "a0", "n0") else (s"b${c - 1}", s"ab${c - 1}", s"nb${c - 1}")
        sb ++= s""",
        f${t}_$c AS (SELECT *,
            CASE WHEN CAST(a$c AS HUGEINT) * $pn * $pn < CAST($pa AS HUGEINT) * n$c * n$c
                 THEN $c ELSE $pb END AS b$c,
            CASE WHEN CAST(a$c AS HUGEINT) * $pn * $pn < CAST($pa AS HUGEINT) * n$c * n$c
                 THEN a$c ELSE $pa END AS ab$c,
            CASE WHEN CAST(a$c AS HUGEINT) * $pn * $pn < CAST($pa AS HUGEINT) * n$c * n$c
                 THEN n$c ELSE $pn END AS nb$c
          FROM ${if (c == 1) s"av$t" else s"f${t}_${c - 1}"})"""
      }
      sb ++= s""",
        asg$t AS (SELECT vec_id, CAST(b${k - 1} AS INTEGER) AS cluster FROM f${t}_${k - 1})"""
      if (t < iters) {
        sb ++= s""",
        sums$t AS (SELECT g.cluster, p.d, CAST(SUM(p.qv) AS BIGINT) AS s,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM asg$t g JOIN q p USING (vec_id) GROUP BY g.cluster, p.d),
        cent$t AS (SELECT prev.c, prev.d,
            COALESCE(nw.s, prev.s) AS s, COALESCE(nw.n, prev.n) AS n
          FROM cent${t - 1} prev
          LEFT JOIN sums$t nw ON nw.cluster = prev.c AND nw.d = prev.d)"""
      }
    }
    sb ++= s"\n        SELECT vec_id, cluster FROM asg$iters"
    sb.toString
  }

  /** Oracle for the full 21-stat zonal enum (Zonal.zonalStatsFull): power
    * sums for moments, histogram quantiles per histQuantileSql, deviation
    * histogram for mad, count-desc/value-asc mode.
    */
  private def zonalFullOracle: String = sqlPx +
    s""", zpx AS (SELECT CAST(zone AS BIGINT) AS zone, band, v
        FROM px JOIN $sqlZones
          ON gx >= zx0 AND gx <= zx1 AND gy >= zy0 AND gy <= zy1),
      base AS (SELECT zone, band, CAST(count(*) AS BIGINT) AS n,
         min(v) AS vmin, max(v) AS vmax,
         CAST(sum(CAST(v AS BIGINT)) AS DOUBLE) AS s1,
         CAST(sum(CAST(v * v AS BIGINT)) AS DOUBLE) AS s2,
         CAST(sum(CAST(v * v * v AS BIGINT)) AS DOUBLE) AS s3,
         CAST(sum(CAST(v * v * v * v AS BIGINT)) AS DOUBLE) AS s4
       FROM zpx GROUP BY 1, 2),
      mom AS (SELECT *, s1 / n AS mean, (s2 - s1 * s1 / n) / n AS variance FROM base),
      mom2 AS (SELECT *, sqrt(variance) AS std FROM mom),
      hist AS (SELECT zone, band, v, CAST(count(*) AS BIGINT) AS cnt
       FROM zpx GROUP BY 1, 2, 3),
      cum AS (SELECT h.zone, h.band, h.v, h.cnt,
         sum(h.cnt) OVER (PARTITION BY h.zone, h.band ORDER BY h.v) AS cume, b.n
       FROM hist h JOIN base b USING (zone, band)),
      qs AS (SELECT zone, band,
         ${histQuantileSql("0.5")} AS median, ${histQuantileSql("0.02")} AS q02,
         ${histQuantileSql("0.25")} AS q1, ${histQuantileSql("0.75")} AS q3,
         ${histQuantileSql("0.98")} AS q98
       FROM cum GROUP BY zone, band, n),
      devh AS (SELECT h.zone, h.band, abs(h.v - q.median) AS d,
         CAST(sum(h.cnt) AS BIGINT) AS cnt
       FROM hist h JOIN qs q USING (zone, band) GROUP BY 1, 2, 3),
      devcum AS (SELECT d.zone, d.band, d.d AS v, d.cnt,
         sum(d.cnt) OVER (PARTITION BY d.zone, d.band ORDER BY d.d) AS cume, b.n
       FROM devh d JOIN base b USING (zone, band)),
      madq AS (SELECT zone, band, ${histQuantileSql("0.5")} AS mad
       FROM devcum GROUP BY zone, band, n),
      modeq AS (SELECT zone, band, v AS mode FROM (
         SELECT zone, band, v,
           row_number() OVER (PARTITION BY zone, band ORDER BY cnt DESC, v ASC) AS rn
         FROM hist) WHERE rn = 1)
      SELECT m.zone, m.band, m.n AS n_px, m.vmin, m.vmax, m.s1 AS vsum,
        m.vmax - m.vmin AS vrange, m.mean, m.variance, m.std,
        (m.s3 / m.n - 3.0 * m.mean * (m.s2 / m.n) + 2.0 * m.mean * m.mean * m.mean)
          / (m.std * m.std * m.std) AS skew,
        (m.s4 / m.n - 4.0 * m.mean * (m.s3 / m.n) + 6.0 * m.mean * m.mean * (m.s2 / m.n)
           - 3.0 * m.mean * m.mean * m.mean * m.mean)
          / (m.variance * m.variance) AS kurtosis,
        q.median, q.q02, q.q1, q.q3, q.q98, q.q3 - q.q1 AS iqr,
        d.mad, mo.mode,
        m.mean / m.std AS snr, m.variance / (m.mean * m.mean) AS eff,
        m.std / m.mean AS cv
      FROM mom2 m JOIN qs q USING (zone, band) JOIN madq d USING (zone, band)
      JOIN modeq mo USING (zone, band)"""

  /** Catmull-Rom ×2 upsample oracle mirroring TileOps2.resampleCubic:
    * separable 4×4 accumulation in the engine's exact op order; the
    * factor-2 grid hits only fx, fy ∈ {0.25, 0.75}, whose kernel weights
    * are exact binary fractions (polynomial eval == these literals
    * bit-for-bit). Source: clamped v(x,y) = (x·7+y·13)%97 on 128×128.
    */
  private def cubicOracle: String = {
    def z(xs: String, ys: String) =
      s"CAST((LEAST(GREATEST($xs, 0), 127) * 7 + LEAST(GREATEST($ys, 0), 127) * 13) % 97 AS DOUBLE)"
    // weights for dx = -1..2 at fx = 0.25 and fx = 0.75
    val w25 = Seq("-0.0703125", "0.8671875", "0.2265625", "-0.0234375")
    val w75 = Seq("-0.0234375", "0.2265625", "0.8671875", "-0.0703125")
    def row(wx: Seq[String], dy: Int) = {
      val terms = (-1 to 2).zip(wx).map { case (dx, w) =>
        s"$w * ${z(s"x0 + ($dx)", s"y0 + ($dy)")}"
      }
      "(" + terms.mkString(" + ") + ")"
    }
    def full(wx: Seq[String], wy: Seq[String]) =
      (-1 to 2).zip(wy).map { case (dy, w) => s"$w * ${row(wx, dy)}" }
        .mkString(" + ")
    s"""WITH tgt AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
         CAST((x // 2) - (1 - (x % 2)) AS INTEGER) AS x0,
         CAST((y // 2) - (1 - (y % 2)) AS INTEGER) AS y0
       FROM range(256) r1(x), range(256) r2(y))
      SELECT x, y, 0 AS band,
        CASE WHEN x % 2 = 1 AND y % 2 = 1 THEN ${full(w25, w25)}
             WHEN x % 2 = 1 AND y % 2 = 0 THEN ${full(w25, w75)}
             WHEN x % 2 = 0 AND y % 2 = 1 THEN ${full(w75, w25)}
             ELSE ${full(w75, w75)}
        END AS v
      FROM tgt"""
  }

  /** Predict-and-merge oracle mirroring Predict.predictAndMerge with the
    * reference's border_check pass list — the pass set comes from the
    * SAME Predict.passOffsetPairs call the engine uses (ts=64, passes=2,
    * 256², border offsets (0,192)/(192,0)/(192,192)). Per pass: covered
    * pixels with their in-patch rel coords; value = pixel + f(rel);
    * weight = quantized edge-distance kernel; merge = lower weighted
    * median via the cumulative-weight window (same form as the
    * patch_merge_wmedian oracle, i.e. Merging.weightedMedian).
    */
  private def predictOracle: String = {
    val ts = 64; val W = 256; val H = 256
    val offs = graft.tiles.Predict.passOffsetPairs(ts, 2, W, H, borderCheck = true)
    val passSql = offs.map { case (oy, ox) =>
      val cx = ox + ((W - ox) / ts) * ts
      val cy = oy + ((H - oy) / ts) * ts
      s"""SELECT x, y, CAST((x - $ox) % $ts AS INTEGER) AS rx,
            CAST((y - $oy) % $ts AS INTEGER) AS ry
          FROM px WHERE x >= $ox AND x < $cx AND y >= $oy AND y < $cy"""
    }.mkString(" UNION ALL ")
    s"""WITH px AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
          FROM range($W) a(x), range($H) b(y)),
        wq AS (SELECT ry, rx,
           CAST(round(
             CASE WHEN (4 - ABS(GREATEST(2 - ry, 0) + GREATEST(3 - ($ts - ry), 0)
                            + GREATEST(2 - rx, 0) + GREATEST(3 - ($ts - rx), 0))) / 4.0 <= 0.0
                  THEN 0.0000001
                  ELSE (4 - ABS(GREATEST(2 - ry, 0) + GREATEST(3 - ($ts - ry), 0)
                            + GREATEST(2 - rx, 0) + GREATEST(3 - ($ts - rx), 0))) / 4.0
             END * 100000000.0) AS BIGINT) AS w
         FROM range($ts) a(ry), range($ts) b(rx)),
        pr AS ($passSql),
        pv AS (SELECT p.x, p.y,
           CAST((p.x*7 + p.y*13) % 97 + (p.rx * 5 + p.ry * 3) % 11 AS DOUBLE) AS v,
           CAST(w.w AS DOUBLE) AS weight
         FROM pr p JOIN wq w ON w.ry = p.ry AND w.rx = p.rx),
        cum AS (SELECT x, y, v, weight,
           sum(weight) OVER (PARTITION BY x, y ORDER BY v, weight
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
           sum(weight) OVER (PARTITION BY x, y) AS tw
         FROM pv)
        SELECT x, y, 0 AS band, min(v) FILTER (WHERE cw * 2.0 >= tw) AS v_merged,
          CAST(count(*) AS BIGINT) AS n_preds
        FROM cum GROUP BY x, y"""
  }

  /** Generalized separable ×2-upsample oracle mirroring
    * TileOps2.resampleSeparable: tap weights are embedded as
    * full-precision literals produced by the SAME TileOps2.tapWeights
    * call the engine uses (Double.toString round-trips through DuckDB's
    * parser bit-for-bit), and term order matches the engine's ascending
    * dx-then-dy accumulation. Source: clamped v(x,y) = (x·7+y·13)%97 on
    * 128×128, factor-2 grid phases fx, fy ∈ {0.25, 0.75}.
    */
  private def separableOracle(radius: Int, w25: Array[Double],
                              w75: Array[Double]): String = {
    def z(xs: String, ys: String) =
      s"CAST((LEAST(GREATEST($xs, 0), 127) * 7 + LEAST(GREATEST($ys, 0), 127) * 13) % 97 AS DOUBLE)"
    def lit(d: Double) = s"(${d.toString})"
    val taps = -(radius - 1) to radius
    def row(wx: Array[Double], dy: Int) = {
      val terms = taps.zip(wx).map { case (dx, w) =>
        s"${lit(w)} * ${z(s"x0 + ($dx)", s"y0 + ($dy)")}"
      }
      "(" + terms.mkString(" + ") + ")"
    }
    def full(wx: Array[Double], wy: Array[Double]) =
      taps.zip(wy).map { case (dy, w) => s"${lit(w)} * ${row(wx, dy)}" }
        .mkString(" + ")
    s"""WITH tgt AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
         CAST((x // 2) - (1 - (x % 2)) AS INTEGER) AS x0,
         CAST((y // 2) - (1 - (y % 2)) AS INTEGER) AS y0
       FROM range(256) r1(x), range(256) r2(y))
      SELECT x, y, 0 AS band,
        CASE WHEN x % 2 = 1 AND y % 2 = 1 THEN ${full(w25, w25)}
             WHEN x % 2 = 1 AND y % 2 = 0 THEN ${full(w25, w75)}
             WHEN x % 2 = 0 AND y % 2 = 1 THEN ${full(w75, w25)}
             ELSE ${full(w75, w75)}
        END AS v
      FROM tgt"""
  }

  /** Shared histogram-quantile CTEs over documents.n_chars for the
    * MAD/IQR scaler oracles (mirrors Scalers.exactQuantiles).
    */
  private def scalerHistCtes: String =
    s"""WITH h AS (SELECT CAST(n_chars AS DOUBLE) AS v, CAST(count(*) AS BIGINT) AS cnt
         FROM documents GROUP BY 1),
       cum AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cume,
          (SELECT CAST(sum(cnt) AS BIGINT) FROM h) AS n FROM h),
       q AS (SELECT ${histQuantileSql("0.5")} AS med, ${histQuantileSql("0.25")} AS q1,
          ${histQuantileSql("0.75")} AS q3 FROM cum GROUP BY n),
       devg AS (SELECT abs(h.v - q.med) AS v, CAST(sum(h.cnt) AS BIGINT) AS cnt
         FROM h CROSS JOIN q GROUP BY 1),
       devcum AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cume,
          (SELECT CAST(sum(cnt) AS BIGINT) FROM devg) AS n FROM devg),
       mq AS (SELECT ${histQuantileSql("0.5")} AS mad FROM devcum GROUP BY n)"""

  /** Sobel magnitude oracle over the 1-band fixture, mirroring
    * TileOps2.sobelEdges (missing-neighbor fallback = center).
    */
  private def sobelOracle: String = {
    def z(dx: Int, dy: Int): String =
      s"""(CASE WHEN x + ($dx) BETWEEN 0 AND 255 AND y + ($dy) BETWEEN 0 AND 255
         THEN CAST(((x + ($dx)) * 7 + (y + ($dy)) * 13) % 97 AS DOUBLE)
         ELSE CAST((x * 7 + y * 13) % 97 AS DOUBLE) END)"""
    val (a, b, c) = (z(-1, -1), z(0, -1), z(1, -1))
    val (d, f) = (z(-1, 0), z(1, 0))
    val (g, h, i) = (z(-1, 1), z(0, 1), z(1, 1))
    s"""WITH base AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
        FROM range(256) r1(x), range(256) r2(y))
      SELECT x, y, 0 AS band,
        sqrt((($a + 2.0 * $d + $g) - ($c + 2.0 * $f + $i))
               * (($a + 2.0 * $d + $g) - ($c + 2.0 * $f + $i))
             + (($a + 2.0 * $b + $c) - ($g + 2.0 * $h + $i))
               * (($a + 2.0 * $b + $c) - ($g + 2.0 * $h + $i))) AS v
      FROM base"""
  }

  /** RGB→HSL oracle mirroring TileOps2.rgbToHsl's exact op order
    * (including the fmod-based numpy-modulo construction).
    */
  private def rgbHslOracle: String =
    """WITH px3 AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
         CAST(b AS INTEGER) AS b,
         CAST((x*7 + y*13 + b*5) % 97 AS DOUBLE) / 96.0 AS v
       FROM range(256) r1(x), range(256) r2(y), range(3) r3(b)),
      piv AS (SELECT x, y,
         max(CASE WHEN b = 0 THEN v END) AS r,
         max(CASE WHEN b = 1 THEN v END) AS g,
         max(CASE WHEN b = 2 THEN v END) AS bl
       FROM px3 GROUP BY x, y),
      calc AS (SELECT x, y, r, g, bl,
         GREATEST(r, g, bl) AS cmax, LEAST(r, g, bl) AS cmin,
         GREATEST(r, g, bl) - LEAST(r, g, bl) AS delta,
         (GREATEST(r, g, bl) + LEAST(r, g, bl)) / 2.0 AS l
       FROM piv),
      hs AS (SELECT x, y, l,
         CASE WHEN delta = 0 THEN 0.0
              ELSE delta / (1.0 - abs(2.0 * l - 1.0)) END AS s,
         CASE WHEN delta = 0 THEN 0.0
              ELSE (((CASE WHEN cmax = r THEN (((g - bl) / delta) % 6.0 + 6.0) % 6.0
                           WHEN cmax = g THEN (bl - r) / delta + 2.0
                           ELSE (r - g) / delta + 4.0 END) * 60.0) % 360.0 + 360.0)
                   % 360.0 / 360.0
         END AS h
       FROM calc)
      SELECT x, y, 0 AS band, LEAST(1.0, GREATEST(0.0, h)) AS v FROM hs
      UNION ALL
      SELECT x, y, 1 AS band, LEAST(1.0, GREATEST(0.0, s)) AS v FROM hs
      UNION ALL
      SELECT x, y, 2 AS band, LEAST(1.0, GREATEST(0.0, l)) AS v FROM hs"""

  /** Bilinear sample in DuckDB mirroring TileOps2.resampleBilinear ops
    * exactly: clamped source lookup of v(x,y) = (x*7 + y*13) % 97 on the
    * 128×128 source.
    */
  private def bilerpSql(x0: String, y0: String, fx: String, fy: String): String = {
    def vv(xs: String, ys: String) =
      s"CAST((LEAST(GREATEST($xs, 0), 127) * 7 + LEAST(GREATEST($ys, 0), 127) * 13) % 97 AS DOUBLE)"
    val top = s"(${vv(x0, y0)} * (1.0 - $fx) + ${vv(s"$x0 + 1", y0)} * $fx)"
    val bot = s"(${vv(x0, s"$y0 + 1")} * (1.0 - $fx) + ${vv(s"$x0 + 1", s"$y0 + 1")} * $fx)"
    s"($top * (1.0 - $fy) + $bot * $fy)"
  }

  /** Horn-gradient oracle: 8 clamped-neighbor terms over the synthetic
    * DEM z(x,y) = (x*3 + y*5) % 41, px 0.25 — band 0 = dz/dx, band 1 = dz/dy.
    */
  /** Shared D8 CTE block for the flow oracles: the 256×256 DEM fixture,
    * the 8 direction rows (ESRI codes, √2 diagonal distance), every
    * in-bounds (pixel, neighbor) drop, and the per-pixel max drop. The
    * drop arithmetic is exact-portable (integer elevations, IEEE divide
    * by sqrt(2.0) rounds identically in both engines), so the argmax
    * code needs no rounding; `dr` because DROP is a keyword.
    */
  private def d8OracleBody: String =
    """base AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
        FROM range(256) r1(x), range(256) r2(y)),
      dirs(code, dx, dy, dist) AS (VALUES
        (1, 1, 0, 1.0), (2, 1, 1, sqrt(2.0)), (4, 0, 1, 1.0),
        (8, -1, 1, sqrt(2.0)), (16, -1, 0, 1.0), (32, -1, -1, sqrt(2.0)),
        (64, 0, -1, 1.0), (128, 1, -1, sqrt(2.0))),
      drops AS (SELECT b.x, b.y, d.code,
          (CAST((b.x * 3 + b.y * 5) % 41 AS DOUBLE)
           - CAST(((b.x + d.dx) * 3 + (b.y + d.dy) * 5) % 41 AS DOUBLE)) / d.dist AS dr
        FROM base b JOIN dirs d
          ON b.x + d.dx BETWEEN 0 AND 255 AND b.y + d.dy BETWEEN 0 AND 255),
      best AS (SELECT x, y, max(dr) AS md FROM drops GROUP BY x, y)"""

  private def d8OracleHead: String = "WITH " + d8OracleBody

  private def demGradOracle: String = {
    def z(dx: Int, dy: Int): String =
      s"""(CASE WHEN x + ($dx) BETWEEN 0 AND 255 AND y + ($dy) BETWEEN 0 AND 255
         THEN CAST(((x + ($dx)) * 3 + (y + ($dy)) * 5) % 41 AS DOUBLE)
         ELSE CAST((x * 3 + y * 5) % 41 AS DOUBLE) END)"""
    val (a, b, c) = (z(-1, -1), z(0, -1), z(1, -1))
    val (d, f) = (z(-1, 0), z(1, 0))
    val (g, h, i) = (z(-1, 1), z(0, 1), z(1, 1))
    s"""WITH base AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
        FROM range(256) r1(x), range(256) r2(y))
      SELECT x, y, 0 AS band,
        (($c + 2.0 * $f + $i) - ($a + 2.0 * $d + $g)) / (8.0 * 0.25) AS v FROM base
      UNION ALL
      SELECT x, y, 1 AS band,
        (($g + 2.0 * $h + $i) - ($a + 2.0 * $b + $c)) / (8.0 * 0.25) AS v FROM base"""
  }

  /** DEM-orientation oracle mirroring TileOps2.demOrientation: Horn
    * gradients (clamped neighbors) → aspect (zero_for_flat) → sin/cos
    * encode, slope-percent encode, normalized height — all ROUND(·, 9)
    * on both sides (sin/cos/atan2/degrees are 1-ulp engines apart).
    */
  private def demOrientOracle: String = {
    def z(dx: Int, dy: Int): String =
      s"""(CASE WHEN x + ($dx) BETWEEN 0 AND 255 AND y + ($dy) BETWEEN 0 AND 255
         THEN CAST(((x + ($dx)) * 3 + (y + ($dy)) * 5) % 41 AS DOUBLE)
         ELSE CAST((x * 3 + y * 5) % 41 AS DOUBLE) END)"""
    val (a, b, c) = (z(-1, -1), z(0, -1), z(1, -1))
    val (d, f) = (z(-1, 0), z(1, 0))
    val (g, h, i) = (z(-1, 1), z(0, 1), z(1, 1))
    val gx = s"((($c + 2.0 * $f + $i) - ($a + 2.0 * $d + $g)) / (8.0 * 0.25))"
    val gy = s"((($g + 2.0 * $h + $i) - ($a + 2.0 * $b + $c)) / (8.0 * 0.25))"
    s"""WITH base AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
        FROM range(256) r1(x), range(256) r2(y)),
      grad AS (SELECT x, y, $gx AS gx, $gy AS gy FROM base),
      asp AS (SELECT x, y,
        CASE WHEN gx = 0.0 AND gy = 0.0 THEN 0.0
             WHEN 90.0 - degrees(atan2(gy, -gx)) < 0.0
               THEN 90.0 - degrees(atan2(gy, -gx)) + 360.0
             WHEN 90.0 - degrees(atan2(gy, -gx)) >= 360.0
               THEN 90.0 - degrees(atan2(gy, -gx)) - 360.0
             ELSE 90.0 - degrees(atan2(gy, -gx)) END AS aspect,
        sqrt(gx * gx + gy * gy) * 100.0 AS slope_pct FROM grad),
      enc AS (SELECT x, y, slope_pct,
        CASE WHEN aspect <> 0.0 THEN aspect / 360.0 ELSE 0.0 END AS an FROM asp)
      SELECT x, y, 0 AS band, ROUND((sin(2.0 * pi() * an) + 1.0) / 2.0, 9) AS v FROM enc
      UNION ALL
      SELECT x, y, 1 AS band, ROUND((cos(2.0 * pi() * an) + 1.0) / 2.0, 9) AS v FROM enc
      UNION ALL
      SELECT x, y, 2 AS band,
        ROUND(CASE WHEN slope_pct = 0.0 THEN 0.0
                   ELSE LEAST(1.0, GREATEST(0.0, slope_pct / 90.0)) END, 9) AS v FROM enc
      UNION ALL
      SELECT x, y, 3 AS band,
        ROUND(CASE WHEN CAST((x * 3 + y * 5) % 41 AS DOUBLE) <> 0.0
                   THEN CAST((x * 3 + y * 5) % 41 AS DOUBLE) / 8849.0
                   ELSE 0.0 END, 9) AS v FROM base"""
  }

  /** Hillshade oracle mirroring TileOps2.demHillshade: the same Horn
    * gradients, then the GDAL formula sin(alt)·cos(slope) +
    * cos(alt)·sin(slope)·cos(az − π/2 − aspect), max(0, 255·shade),
    * ROUND(·, 9) both sides (the DEM-family trig recipe).
    */
  private def demHillshadeOracle: String = {
    def z(dx: Int, dy: Int): String =
      s"""(CASE WHEN x + ($dx) BETWEEN 0 AND 255 AND y + ($dy) BETWEEN 0 AND 255
         THEN CAST(((x + ($dx)) * 3 + (y + ($dy)) * 5) % 41 AS DOUBLE)
         ELSE CAST((x * 3 + y * 5) % 41 AS DOUBLE) END)"""
    val (a, b, c) = (z(-1, -1), z(0, -1), z(1, -1))
    val (d, f) = (z(-1, 0), z(1, 0))
    val (g, h, i) = (z(-1, 1), z(0, 1), z(1, 1))
    val gx = s"((($c + 2.0 * $f + $i) - ($a + 2.0 * $d + $g)) / (8.0 * 0.25))"
    val gy = s"((($g + 2.0 * $h + $i) - ($a + 2.0 * $b + $c)) / (8.0 * 0.25))"
    s"""WITH base AS (SELECT CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y
        FROM range(256) r1(x), range(256) r2(y)),
      grad AS (SELECT x, y, $gx AS gx, $gy AS gy FROM base)
      SELECT x, y, 0 AS band,
        ROUND(GREATEST(0.0, 255.0 * (
          sin(radians(45.0)) * cos(atan(sqrt(gx * gx + gy * gy)))
          + cos(radians(45.0)) * sin(atan(sqrt(gx * gx + gy * gy)))
            * cos(radians(315.0) - pi() / 2.0 - atan2(gy, -gx)))), 9) AS v
      FROM grad"""
  }

  /** Generated DuckDB tail for the 16-bit simhash oracle (hex-digit value
    * via strpos; bit b via integer division parity; majority vote sign).
    */
  private def simhashOracleTail: String = {
    val hv = (1 to 4).map(p =>
      s"(strpos('0123456789abcdef', substr(md5(tok), $p, 1)) - 1) * ${math.pow(16, 4 - p).toLong}")
      .mkString(" + ")
    val bitSums = (0 until 16).map(b =>
      s"sum(CASE WHEN (hv // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b$b").mkString(", ")
    val assemble = (0 until 16).map(b =>
      s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s""", hvt AS (SELECT doc_id, $hv AS hv FROM toks),
       bits AS (SELECT doc_id, $bitSums FROM hvt GROUP BY doc_id)
       SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits"""
  }

  /** Multi-script fixture literals shared by the `text_scripts` query
    * and its oracle (identical strings interpolated into both engines).
    */
  private object ScriptFixture {
    val cyr: String = "привет мир снова " * 4
    val cjk: String = "你好世界汉字测试" * 5
    val grk: String = "γεια σου κόσμε " * 4
    val arb: String = " مرحبا بالعالم"
    val none: String = "12345 .,!? 67890"
  }

  /** Generated DuckDB oracle for the Unicode script profile: the same
    * count-by-strip math over RE2 \x{...} block classes, dominant =
    * first block (in the pinned order) reaching the max, all-zero →
    * 'none' — the exact fold semantics of TextOps.scriptProfile.
    */
  private def scriptProfileOracle: String = {
    val blocks = Seq(
      "latin" -> "[A-Za-z]",
      "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
      "greek" -> "[\\x{0370}-\\x{03FF}]",
      "arabic" -> "[\\x{0600}-\\x{06FF}]",
      "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
      "hangul" -> "[\\x{AC00}-\\x{D7AF}]",
      "devanagari" -> "[\\x{0900}-\\x{097F}]")
    val names = blocks.map(_._1)
    val counts = blocks.map { case (n, cls) =>
      s"CAST(length(t) - length(regexp_replace(t, '$cls', '', 'g')) AS BIGINT) AS n_$n"
    }.mkString(", ")
    val mx = s"GREATEST(${names.map("n_" + _).mkString(", ")})"
    val dom = names.map(n => s"WHEN n_$n = mx THEN '$n'").mkString(" ")
    s"""WITH fx AS (SELECT doc_id,
         CASE doc_id % 6
           WHEN 1 THEN '${ScriptFixture.cyr}'
           WHEN 2 THEN substr(text, 1, 20) || '${ScriptFixture.cjk}'
           WHEN 3 THEN '${ScriptFixture.grk}'
           WHEN 4 THEN text || '${ScriptFixture.arb}'
           WHEN 5 THEN '${ScriptFixture.none}'
           ELSE text END AS t
         FROM documents),
       c AS (SELECT doc_id, $counts FROM fx),
       d AS (SELECT *, $mx AS mx FROM c)
       SELECT doc_id, ${names.map("n_" + _).mkString(", ")},
         CASE WHEN mx <= 0 THEN 'none' $dom END AS dominant
       FROM d"""
  }

  /** Generated DuckDB tail for the 64-bit simhash PAIR oracle: the
    * md5prefix token hash split hi/lo 32-bit (each fits a non-negative
    * BIGINT in both engines), 64 majority-vote bit sums, two's-complement
    * assembly through HUGEINT (bit 63 wraps mod 2^64 → BIGINT), then the
    * BRUTE-FORCE all-pairs hamming join at distance ≤ 3 — deliberately
    * NOT the banded join, so a hash-exact match certifies the Spark
    * pigeonhole join lossless on this corpus.
    */
  private def simhash64PairsOracleTail: String = {
    val bitsLo = (0 until 32).map(b =>
      s"sum(CASE WHEN (lo // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b$b").mkString(", ")
    val bitsHi = (0 until 32).map(b =>
      s"sum(CASE WHEN (hi // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b${b + 32}").mkString(", ")
    val asm = (0 until 64).map { b =>
      val pow = if (b == 63) "CAST('9223372036854775808' AS HUGEINT)"
                else s"CAST(${1L << b} AS HUGEINT)"
      s"(CASE WHEN b$b > 0 THEN $pow ELSE 0 END)"
    }.mkString(" + ")
    s""", hvt AS (SELECT doc_id,
         CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS hi,
         CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS lo FROM toks),
       bits AS (SELECT doc_id, $bitsLo, $bitsHi FROM hvt GROUP BY doc_id),
       sh AS (SELECT doc_id,
         CAST(CASE WHEN ($asm) >= CAST('9223372036854775808' AS HUGEINT)
              THEN ($asm) - CAST('18446744073709551616' AS HUGEINT)
              ELSE ($asm) END AS BIGINT) AS simhash FROM bits)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS dist
       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
  }

  /** Generated DuckDB oracle for quantized-dot-product top-k (64 dims). */
  /** Full mirror of Similarity.lshBucketTopK (also nested by the
    * ann_recall oracle).
    */
  private def webPagerankOracle: String = {
      // unrolled mirror of WebOps.pageRank's 5 integer fixed-point
      // iterations: same floor divisions in the same operand order;
      // every SUM is CAST back to BIGINT (DuckDB widens to HUGEINT)
      val scale = 1000000000000L
      def iter(k: Int): String =
        s""", dang$k AS (
             SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS d
             FROM r${k - 1} WHERE host NOT IN (SELECT src FROM edges)),
           r$k AS (
             SELECT n.host,
                    (($scale * 3) // (20 * (SELECT cnt FROM nn)))
                  + (((SELECT d FROM dang$k) * 17) // (20 * (SELECT cnt FROM nn)))
                  + COALESCE(c.contrib, 0) AS rank
             FROM nodes n LEFT JOIN (
               SELECT e.dst AS host,
                      CAST(SUM((r.rank * 17) // (20 * dg.deg)) AS BIGINT) AS contrib
               FROM r${k - 1} r
               JOIN edges e ON r.host = e.src
               JOIN deg dg ON dg.src = e.src
               GROUP BY e.dst) c ON n.host = c.host)"""
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         nodes AS (
           SELECT DISTINCT host FROM (
             SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         nn AS (SELECT COUNT(*) AS cnt FROM nodes),
         deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         r0 AS (SELECT host, $scale // (SELECT cnt FROM nn) AS rank FROM nodes)
         ${(1 to 5).map(iter).mkString("\n")}
         SELECT host, rank FROM r5"""
    }

  private def langidOracle: String =
    """WITH cnts AS (SELECT doc_id, lang,
           (length(text) - length(replace(text, 'the', ''))) // 3 AS c_en,
           (length(text) - length(replace(text, 'der', ''))) // 3 AS c_de,
           (length(text) - length(replace(text, 'les', ''))) // 3 AS c_fr,
           (length(text) - length(replace(text, 'los', ''))) // 3 AS c_es,
           (length(text) - length(replace(text, 'spark', ''))) // 5 AS c_zh
         FROM documents)
        SELECT doc_id, lang,
          CASE WHEN c_zh > GREATEST(c_en, c_de, c_fr, c_es) THEN 'zh'
               WHEN c_es > GREATEST(c_en, c_de, c_fr) THEN 'es'
               WHEN c_fr > GREATEST(c_en, c_de) THEN 'fr'
               WHEN c_de > c_en THEN 'de'
               ELSE 'en' END AS pred_lang,
          GREATEST(c_en, c_de, c_fr, c_es, c_zh) AS n_markers
        FROM cnts"""

  private def webHyperballOracle: String = {
      // unrolled mirror of WebOps.neighborhoodFunction: the md5prefix
      // hash60 → (p=9 bucket, rank) split per node key, then 3 rounds of
      // register-max over out-edges, each summarized with the exact
      // integer zsum fold (the url_host_hll idiom summed over all hosts)
      def round(k: Int): String =
        s""", regs$k AS (
             SELECT host, reg_no, MAX(reg) AS reg FROM (
               SELECT host, reg_no, reg FROM regs${k - 1}
               UNION ALL
               SELECT e.src AS host, r.reg_no, r.reg
               FROM edges e JOIN regs${k - 1} r ON e.dst = r.host)
             GROUP BY host, reg_no)"""
      def summ(k: Int): String =
        s"""SELECT $k AS t, COUNT(DISTINCT host) AS hosts,
              COUNT(*) AS sum_nonzero,
              CAST(SUM(CAST((CAST(1 AS BIGINT) << (52 - reg)) AS HUGEINT))
                 + CAST(COUNT(DISTINCT host) * 512 - COUNT(*) AS HUGEINT) *
                   (CAST(1 AS BIGINT) << 52) AS DECIMAL(38,0)) AS zsum
            FROM regs$k"""
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         nodes AS (SELECT DISTINCT host FROM (
           SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         hh AS (SELECT host,
             CAST('0x' || substr(md5(CAST(host AS VARCHAR)), 1, 15) AS BIGINT) AS h60
           FROM nodes),
         rr AS (SELECT host, h60 & 511 AS reg_no, h60 >> 9 AS rest FROM hh),
         regs0 AS (SELECT host, reg_no,
             CAST(CASE WHEN rest = 0 THEN 52
                  ELSE 52 - length(to_base(rest, 2)) END AS INT) AS reg
           FROM rr)
         ${(1 to 3).map(round).mkString("\n")}
         ${(0 to 3).map(summ).mkString("\n UNION ALL \n")}"""
    }

  private def webPagerankWeightedOracle: String = {
      // the webPagerankOracle recipe with per-edge weights: contribution
      // = (rank·17·w) // (20·wsum), parallel edges collapsed by SUM
      val scale = 1000000000000L
      def iter(k: Int): String =
        s""", dang$k AS (
             SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS d
             FROM r${k - 1} WHERE host NOT IN (SELECT src FROM edges)),
           r$k AS (
             SELECT n.host,
                    (($scale * 3) // (20 * (SELECT cnt FROM nn)))
                  + (((SELECT d FROM dang$k) * 17) // (20 * (SELECT cnt FROM nn)))
                  + COALESCE(c.contrib, 0) AS rank
             FROM nodes n LEFT JOIN (
               SELECT e.dst AS host,
                      CAST(SUM((CAST(r.rank AS HUGEINT) * 17 * e.w)
                           // (20 * ws.wsum)) AS BIGINT) AS contrib
               FROM r${k - 1} r
               JOIN edges e ON r.host = e.src
               JOIN ws ON ws.src = e.src
               GROUP BY e.dst) c ON n.host = c.host)"""
      s"""WITH raw AS (
           SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst,
             1 + doc_id % 5 AS w FROM documents
           UNION ALL
           SELECT doc_id % 97, (doc_id * 17 + 3) % 97, 1 + doc_id % 3 FROM documents),
         edges AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM raw
           WHERE src <> dst GROUP BY 1, 2),
         ws AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wsum FROM edges GROUP BY 1),
         nodes AS (SELECT DISTINCT host FROM (
           SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         nn AS (SELECT COUNT(*) AS cnt FROM nodes),
         r0 AS (SELECT host, $scale // (SELECT cnt FROM nn) AS rank FROM nodes)
         ${(1 to 5).map(iter).mkString("\n")}
         SELECT host, rank FROM r5"""
    }

  private def webBallProfileOracle: String = {
      // the webHyperballOracle register rounds, summarized per host
      def round(k: Int): String =
        s""", regs$k AS (
             SELECT host, reg_no, MAX(reg) AS reg FROM (
               SELECT host, reg_no, reg FROM regs${k - 1}
               UNION ALL
               SELECT e.src AS host, r.reg_no, r.reg
               FROM edges e JOIN regs${k - 1} r ON e.dst = r.host)
             GROUP BY host, reg_no)"""
      def prof(k: Int): String =
        s"""SELECT host, $k AS t, CAST(COUNT(*) AS BIGINT) AS nonzero
            FROM regs$k GROUP BY host"""
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         nodes AS (SELECT DISTINCT host FROM (
           SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         hh AS (SELECT host,
             CAST('0x' || substr(md5(CAST(host AS VARCHAR)), 1, 15) AS BIGINT) AS h60
           FROM nodes),
         rr AS (SELECT host, h60 & 511 AS reg_no, h60 >> 9 AS rest FROM hh),
         regs0 AS (SELECT host, reg_no,
             CAST(CASE WHEN rest = 0 THEN 52
                  ELSE 52 - length(to_base(rest, 2)) END AS INT) AS reg
           FROM rr)
         ${(1 to 2).map(round).mkString("\n")}
         ${(0 to 2).map(prof).mkString("\n UNION ALL \n")}"""
    }

  private def webTrustrankOracle: String = {
      // unrolled mirror of WebOps.trustRank's 5 seeded integer
      // fixed-point iterations: teleport + dangling mass go to the seed
      // set only, floor divisions in the same operand order as the Scala
      val scale = 1000000000000L
      def iter(k: Int): String =
        s""", dang$k AS (
             SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS d
             FROM r${k - 1} WHERE host NOT IN (SELECT src FROM edges)),
           r$k AS (
             SELECT n.host,
                    (CASE WHEN s.host IS NOT NULL
                      THEN (($scale * 3) // (20 * (SELECT cnt FROM sn)))
                         + (((SELECT d FROM dang$k) * 17) // (20 * (SELECT cnt FROM sn)))
                      ELSE 0 END)
                  + COALESCE(c.contrib, 0) AS rank
             FROM nodes n
             LEFT JOIN seeds s ON n.host = s.host
             LEFT JOIN (
               SELECT e.dst AS host,
                      CAST(SUM((r.rank * 17) // (20 * dg.deg)) AS BIGINT) AS contrib
               FROM r${k - 1} r
               JOIN edges e ON r.host = e.src
               JOIN deg dg ON dg.src = e.src
               GROUP BY e.dst) c ON n.host = c.host)"""
      s"""WITH edges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
             UNION ALL
             SELECT doc_id % 97, (doc_id * 17 + 3) % 97 FROM documents)
           WHERE src <> dst),
         nodes AS (
           SELECT DISTINCT host FROM (
             SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         seeds AS (SELECT host FROM nodes WHERE host % 13 = 0),
         sn AS (SELECT COUNT(*) AS cnt FROM seeds),
         deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         r0 AS (
           SELECT n.host,
                  CASE WHEN s.host IS NOT NULL
                       THEN $scale // (SELECT cnt FROM sn) ELSE 0 END AS rank
           FROM nodes n LEFT JOIN seeds s ON n.host = s.host)
         ${(1 to 5).map(iter).mkString("\n")}
         SELECT host, rank FROM r5"""
    }

  private def annLshOracle: String =
      """WITH q AS (SELECT vec_id, d,
           CAST(ROUND(CAST(embedding[d + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS qv
         FROM embeddings, range(64) t(d)),
        bits AS (SELECT vec_id, p,
          CASE WHEN CAST(SUM(CASE WHEN CAST(FLOOR((d * 2654435761 + p * 40503 + 11) / 65536.0) AS BIGINT) % 2 = 0
                         THEN qv ELSE -qv END) AS BIGINT) > 0
               THEN 1 ELSE 0 END AS bit
         FROM q, range(16) pp(p) GROUP BY vec_id, p),
        bkeys AS (SELECT vec_id, p // 8 AS band,
          CAST(SUM(bit * (1::BIGINT << (p % 8))) AS BIGINT) AS key
         FROM bits GROUP BY vec_id, p // 8),
        idx AS (SELECT vec_id, band, key,
          row_number() OVER (PARTITION BY band, key ORDER BY vec_id) AS rn
         FROM bkeys),
        cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         FROM bkeys a JOIN idx b
           ON a.band = b.band AND a.key = b.key
           AND a.vec_id <> b.vec_id AND b.rn <= 128),
        scored AS (SELECT c.query_id, c.neighbor_id,
          CAST(SUM(qa.qv * qb.qv) AS BIGINT) AS score
         FROM cand c
           JOIN q qa ON qa.vec_id = c.query_id
           JOIN q qb ON qb.vec_id = c.neighbor_id AND qb.d = qa.d
         GROUP BY c.query_id, c.neighbor_id),
        ranked AS (SELECT query_id, neighbor_id, score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
         FROM scored)
        SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5"""

  private def mlKnnOracle: String = {
    val dist = (1 to 64)
      .map(i => s"(a.q[$i] - b.q[$i]) * (a.q[$i] - b.q[$i])").mkString(" + ")
    s"""WITH q AS (SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
       FROM embeddings),
       scored AS (SELECT a.vec_id AS query_id, a.label AS label_true,
           b.label AS nlabel, b.vec_id AS neighbor_id,
           CAST($dist AS BIGINT) AS dist
         FROM q a JOIN q b ON b.vec_id % 10 <> 0
         WHERE a.vec_id % 10 = 0),
       nearest AS (SELECT * FROM (SELECT query_id, label_true, nlabel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist ASC, neighbor_id ASC) AS rank
         FROM scored) WHERE rank <= 5),
       votes AS (SELECT query_id, label_true, nlabel,
           CAST(count(*) AS BIGINT) AS votes
         FROM nearest GROUP BY query_id, label_true, nlabel),
       best AS (SELECT * FROM (SELECT query_id, label_true, nlabel, votes,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY votes DESC, nlabel ASC) AS vrank
         FROM votes) WHERE vrank = 1)
       SELECT query_id AS vec_id, label_true, nlabel AS label_pred, votes,
         (nlabel = label_true) AS correct
       FROM best"""
  }

  private def annTopKOracle: String = {
    val dot = (1 to 64).map(i => s"a.q[$i] * b.q[$i]").mkString(" + ")
    s"""WITH q AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
       FROM embeddings),
       scored AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST($dot AS BIGINT) AS score
         FROM q a JOIN q b ON b.vec_id <> a.vec_id
         WHERE a.vec_id < 50),
       ranked AS (SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         FROM scored)
       SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
       FROM ranked WHERE rank <= 5"""
  }
}
