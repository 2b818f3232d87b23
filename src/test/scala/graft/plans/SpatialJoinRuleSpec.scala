package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.GraftFunctions

class SpatialJoinRuleSpec extends AnyFunSuite {

  // A session left behind by an earlier suite would be returned by
  // getOrCreate WITHOUT our extensions; clear it so the builder makes a
  // fresh session (the underlying SparkContext is still reused).
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
    .master("local[4]")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  }

  private def fixtures(): Unit = {
    GraftFunctions.register(spark)
    spark.range(2000).selectExpr(
      "id",
      "(cast(id * 1103515245 % 360000000 as double) / 1000000.0) - 180.0 AS lon",
      "(cast(id * 2654435761 % 170000000 as double) / 1000000.0) - 85.0 AS lat")
      .createOrReplaceTempView("points")
    spark.createDataFrame(Seq(
      (1L, "POLYGON((0 0, 60 0, 60 40, 0 40, 0 0))"),
      (2L, "POLYGON((-120 -50, -20 -50, -20 30, -120 30, -120 -50))"),
      (3L, "POLYGON((100 10, 170 10, 170 80, 100 80, 100 10))")))
      .toDF("poly_id", "wkt")
      .createOrReplaceTempView("polys")
  }

  test("st_contains_point join is rewritten to a cover-cell equi-join") {
    fixtures()
    val q = spark.sql(
      """SELECT poly_id, count(*) AS n FROM points p JOIN polys g
         ON st_contains_point(g.wkt, p.lon, p.lat) GROUP BY poly_id""")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"spatial join not rewritten:\n$physical")
    // correctness: equals a straight-Scala evaluation of the same predicate
    val got = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = spark.sql("SELECT * FROM points").collect().flatMap { r =>
      val lon = r.getDouble(1); val lat = r.getDouble(2)
      Seq(
        (1L, lon >= 0 && lon <= 60 && lat >= 0 && lat <= 40),
        (2L, lon >= -120 && lon <= -20 && lat >= -50 && lat <= 30),
        (3L, lon >= 100 && lon <= 170 && lat >= 10 && lat <= 80)
      ).filter(_._2).map(_._1)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got === expect)
    assert(got.values.sum > 100, "fixture should produce joins")
  }

  test("flipped operand order also rewrites") {
    fixtures()
    val q = spark.sql(
      """SELECT poly_id, count(*) AS n FROM polys g JOIN points p
         ON st_contains_point(g.wkt, p.lon, p.lat) GROUP BY poly_id""")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"))
    assert(q.collect().map(_.getLong(1)).sum > 100)
  }

  test("composite AND condition rewrites and keeps the extra predicate") {
    fixtures()
    val q = spark.sql(
      """SELECT poly_id, count(*) AS n FROM points p JOIN polys g
         ON st_contains_point(g.wkt, p.lon, p.lat) AND p.id % 2 = 0
         GROUP BY poly_id""")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"composite spatial join not rewritten:\n$physical")
    val got = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = spark.sql("SELECT * FROM points WHERE id % 2 = 0").collect().flatMap { r =>
      val lon = r.getDouble(1); val lat = r.getDouble(2)
      Seq(
        (1L, lon >= 0 && lon <= 60 && lat >= 0 && lat <= 40),
        (2L, lon >= -120 && lon <= -20 && lat >= -50 && lat <= 30),
        (3L, lon >= 100 && lon <= 170 && lat >= 10 && lat <= 80)
      ).filter(_._2).map(_._1)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got === expect)
  }

  test("left-semi and left-anti spatial joins rewrite and partition the points") {
    fixtures()
    // explicit semi/anti join syntax: EXISTS subqueries only become joins
    // AFTER user optimizer rules run (Spark's RewriteSubquery batch), so
    // the rewrite targets the join form
    val semi = spark.sql(
      """SELECT count(*) FROM points p LEFT SEMI JOIN polys g
         ON st_contains_point(g.wkt, p.lon, p.lat)""")
    val anti = spark.sql(
      """SELECT count(*) FROM points p LEFT ANTI JOIN polys g
         ON st_contains_point(g.wkt, p.lon, p.lat)""")
    for (q <- Seq(semi, anti)) {
      val physical = q.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"),
        s"semi/anti spatial join not rewritten:\n$physical")
    }
    val nSemi = semi.collect()(0).getLong(0)
    val nAnti = anti.collect()(0).getLong(0)
    assert(nSemi + nAnti == 2000L)
    // oracle: direct per-point evaluation
    val inAny = spark.sql("SELECT * FROM points").collect().count { r =>
      val lon = r.getDouble(1); val lat = r.getDouble(2)
      (lon >= 0 && lon <= 60 && lat >= 0 && lat <= 40) ||
        (lon >= -120 && lon <= -20 && lat >= -50 && lat <= 30) ||
        (lon >= 100 && lon <= 170 && lat >= 10 && lat <= 80)
    }
    assert(nSemi == inAny.toLong)
  }

  test("st_dwithin self theta-join rewrites to the cell-bucket equi-join") {
    fixtures()
    val q = spark.sql(
      """SELECT a.id AS ia, b.id AS ib FROM points a JOIN points b
         ON st_dwithin(a.lon, a.lat, b.lon, b.lat, 3.0) AND a.id < b.id""")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"dwithin join not rewritten:\n$physical")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference
    val pts = spark.sql("SELECT * FROM points").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expect = (for {
      a <- pts; b <- pts if a._1 < b._1
      dx = a._2 - b._2; dy = a._3 - b._3
      if dx * dx + dy * dy <= 9.0
    } yield (a._1, b._1)).toSet
    assert(got === expect)
    assert(got.size > 100, s"fixture should pair (got ${got.size})")
  }

  test("st_dwithin semi join and swapped argument sides both rewrite") {
    fixtures()
    spark.createDataFrame(Seq((100L, 10.0, 10.0), (101L, -170.0, 80.0)))
      .toDF("pid", "plon", "plat").createOrReplaceTempView("probes")
    // predicate arguments mention (right, left) in that order — the rule
    // must recognize the swap; semi preserves the probe side
    val q = spark.sql(
      """SELECT count(*) FROM points p LEFT SEMI JOIN probes q
         ON st_dwithin(q.plon, q.plat, p.lon, p.lat, 5.0)""")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"swapped dwithin semi not rewritten:\n$physical")
    val pts = spark.sql("SELECT * FROM points").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val expect = pts.count { case (lon, lat) =>
      Seq((10.0, 10.0), (-170.0, 80.0)).exists { case (qx, qy) =>
        val dx = lon - qx; val dy = lat - qy; dx * dx + dy * dy <= 25.0
      }
    }
    assert(q.collect()(0).getLong(0) === expect.toLong)
  }
}
