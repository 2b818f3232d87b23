package graft.joins

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{BBox, PIP, Polygon, RTree}

/** Distributed spatial joins.
  *
  * Strategy mirrors the standard Spark spatial-join reduction of the
  * reference's nested-loop / SQLite-R-tree joins
  * (reference: buteo/vector/intersect.py:27-84,
  * buteo/vector/extract_by_location.py:28-169):
  *
  *  - small polygon side → broadcast an STR R-tree of polygon rings to all
  *    executors; each probe row does an index lookup + exact winding-number
  *    refine. No shuffle of the big side at all — at 10^12 probe rows this
  *    is a map-only stage.
  *  - large-large → cover-cell equi-join: explode polygon cover cells,
  *    assign each point its cell, hash-join on cell id, exact refine
  *    (see coverCellJoin).
  */
object SpatialJoins {

  /** Broadcast point-in-polygon join: returns `points` columns + `poly_id`
    * for every (point, polygon) containment pair (inner join semantics —
    * a point in k polygons yields k rows; points in none are dropped).
    */
  def pipJoinBroadcast(points: DataFrame, polys: Seq[(Long, Polygon)],
                       lonCol: String, latCol: String): DataFrame = {
    val spark = points.sparkSession
    val polyArr = polys.toArray
    val tree = RTree.build(polyArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((polyArr, tree))
    val matchPolys = udf { (lon: Double, lat: Double) =>
      val (ps, t) = bc.value
      t.queryPoint(lon, lat).filter(i => ps(i)._2.contains(lon, lat)).map(i => ps(i)._1)
    }
    points
      .withColumn("__polys", matchPolys(col(lonCol), col(latCol)))
      .withColumn("poly_id", explode(col("__polys")))
      .drop("__polys")
  }

  /** Left-semi flavor: points that fall in at least one polygon (invert =
    * left-anti: points in none). Reference semantics:
    * buteo/vector/extract_by_location.py:142-169 (invert at :164).
    */
  def pipSemiJoin(points: DataFrame, polys: Seq[(Long, Polygon)],
                  lonCol: String, latCol: String, invert: Boolean = false): DataFrame = {
    val spark = points.sparkSession
    val polyArr = polys.toArray
    val tree = RTree.build(polyArr.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((polyArr, tree))
    val hit = udf { (lon: Double, lat: Double) =>
      val (ps, t) = bc.value
      t.queryPoint(lon, lat).exists(i => ps(i)._2.contains(lon, lat))
    }
    points.filter(if (invert) !hit(col(lonCol), col(latCol)) else hit(col(lonCol), col(latCol)))
  }
}
