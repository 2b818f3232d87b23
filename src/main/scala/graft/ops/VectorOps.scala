package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{BBox, Polygon, RTree, Wkt}

/** Vector-layer operators over DataFrames with a WKT geometry column —
  * the Spark re-expression of the reference's vector toolbox
  * (reference: the buteo core_vector and vector packages).
  */
object VectorOps {

  /** wkt → (area, xMin, xMax, yMin, yMax) via the engine's WKT parser.
    * Scala UDF (geometry parse is object code; not a hot scan path).
    */
  private val geomInfo = udf { (wkt: String) =>
    val p = Wkt.parsePolygon(wkt)
    val b = p.bbox
    (Wkt.area(p), b.xMin, b.xMax, b.yMin, b.yMax)
  }

  def withGeomInfo(df: DataFrame, wktCol: String): DataFrame =
    df.withColumn("__g", geomInfo(col(wktCol)))
      .withColumn("area", col("__g._1"))
      .withColumn("x_min", col("__g._2")).withColumn("x_max", col("__g._3"))
      .withColumn("y_min", col("__g._4")).withColumn("y_max", col("__g._5"))
      .drop("__g")

  /** SELECT * WHERE attr IN (...) — reference:
    * buteo/vector/extract_by_attribute.py:23-129.
    */
  def extractByAttribute(df: DataFrame, attrCol: String, values: Seq[String]): DataFrame =
    df.filter(col(attrCol).isin(values: _*))

  /** Dissolve by attribute: per class, bbox hull + feature count + total
    * area (reference: buteo/vector/dissolve.py:26-132 — the v1 engine
    * dissolves extents/metrics; exact ring union is staged).
    */
  def dissolveByAttribute(df: DataFrame, attrCol: String, wktCol: String): DataFrame =
    withGeomInfo(df, wktCol)
      .groupBy(attrCol)
      .agg(count(lit(1)).as("n_features"),
        min("x_min").as("x_min"), max("x_max").as("x_max"),
        min("y_min").as("y_min"), max("y_max").as("y_max"),
        sum("area").as("total_area"))

  /** Merge layers (reference: core_vector_merge.py:24-123). */
  def mergeLayers(layers: Seq[DataFrame]): DataFrame =
    layers.reduce(_ unionByName _)

  /** Vector-vector intersects join: broadcast R-tree of layer B's
    * envelopes, refine with exact ring predicates
    * (reference: buteo/vector/intersect.py:27-84 — SQLite R-tree +
    * ST_INTERSECTS). For polygon pairs the refine tests shell-vertex
    * containment both ways plus bbox overlap (exact for convex shells;
    * v1 semantics documented).
    */
  def intersectJoin(big: DataFrame, small: DataFrame, wktCol: String,
                    idColBig: String, idColSmall: String): DataFrame = {
    val spark = big.sparkSession
    val smallFeats = small.select(col(idColSmall).cast("long"), col(wktCol))
      .collect().map(r => (r.getLong(0), Wkt.parsePolygon(r.getString(1))))
    val tree = RTree.build(smallFeats.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((smallFeats, tree))
    val matches = udf { (wkt: String) =>
      val (feats, t) = bc.value
      val p = Wkt.parsePolygon(wkt)
      val b = p.bbox
      t.query(b.xMin, b.xMax, b.yMin, b.yMax).filter { i =>
        val q = feats(i)._2
        polygonsIntersect(p, q)
      }.map(i => feats(i)._1)
    }
    big.withColumn("__m", matches(col(wktCol)))
      .withColumn("match_fid", explode(col("__m")))
      .drop("__m")
  }

  /** Exact intersects for polygons whose shells are convex (covers the
    * engine's rectangle/hex fixtures): any vertex of one inside the
    * other, or any edge pair crossing.
    */
  private[ops] def polygonsIntersect(a: Polygon, b: Polygon): Boolean = {
    if (!a.bbox.intersects(b.bbox)) return false
    val ra = a.rings(0); val rb = b.rings(0)
    var i = 0
    while (i < ra.length) {
      if (b.contains(ra(i), ra(i + 1))) return true
      i += 2
    }
    i = 0
    while (i < rb.length) {
      if (a.contains(rb(i), rb(i + 1))) return true
      i += 2
    }
    // edge crossings (covers overlap without vertex containment)
    segmentsCross(ra, rb)
  }

  private def segmentsCross(ra: Array[Double], rb: Array[Double]): Boolean = {
    val na = ra.length / 2; val nb = rb.length / 2
    var i = 0
    while (i < na) {
      val j = (i + 1) % na
      val ax1 = ra(2 * i); val ay1 = ra(2 * i + 1)
      val ax2 = ra(2 * j); val ay2 = ra(2 * j + 1)
      var k = 0
      while (k < nb) {
        val l = (k + 1) % nb
        if (segInt(ax1, ay1, ax2, ay2, rb(2 * k), rb(2 * k + 1), rb(2 * l), rb(2 * l + 1)))
          return true
        k += 1
      }
      i += 1
    }
    false
  }

  private def segInt(x1: Double, y1: Double, x2: Double, y2: Double,
                     x3: Double, y3: Double, x4: Double, y4: Double): Boolean = {
    def d(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double) =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    val d1 = d(x3, y3, x4, y4, x1, y1)
    val d2 = d(x3, y3, x4, y4, x2, y2)
    val d3 = d(x1, y1, x2, y2, x3, y3)
    val d4 = d(x1, y1, x2, y2, x4, y4)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  /** Multipart → singlepart: explode MULTIPOLYGON into per-part rows
    * (reference: buteo/core_vector/conversion/multipart.py:58-166).
    */
  def multipartToSingle(df: DataFrame, wktCol: String, idCol: String): DataFrame = {
    val parts = udf { (wkt: String) => Wkt.parsePolygons(wkt).map(Wkt.toWkt) }
    df.withColumn("part_wkt", explode(parts(col(wktCol))))
      .withColumn("part_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy("part_wkt")) - 1)
  }
}
