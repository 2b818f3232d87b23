package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("published geohash test vectors") {
    // geohash.org's canonical examples (odd and even precisions)
    assert(Geohash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj")
    assert(Geohash.encode(-5.6, 42.6, 5) == "ezs42")
    assert(Geohash.encode(10.40744, 57.64911, 8) == "u4pruydq")
    // equator/meridian origin sits at the exact center: first cell of the
    // upper-right quadrant at every precision
    assert(Geohash.encode(0.0, 0.0, 1) == "s")
    assert(Geohash.encode(0.0, 0.0, 12) == "s00000000000")
  }

  test("out-of-range coordinates clamp to the edge cells") {
    assert(Geohash.encode(-180.0, -90.0, 6) == "000000")
    assert(Geohash.encode(180.0, 90.0, 6) == Geohash.encode(179.999999, 89.999999, 6))
    assert(Geohash.encode(500.0, 99.0, 4) == Geohash.encode(179.999999, 89.999999, 4))
  }

  test("precision-p hash is a string prefix of every higher precision") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 180.0 - 90.0
      val full = Geohash.encode(lon, lat, 12)
      (1 to 11).foreach { p =>
        assert(Geohash.encode(lon, lat, p) == full.take(p), s"p=$p lon=$lon lat=$lat")
      }
    }
  }

  test("column builder is bit-identical to the JVM scalar") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (i.toLong, rnd.nextDouble() * 400.0 - 200.0, rnd.nextDouble() * 200.0 - 100.0)
    }
    val df = rows.toDF("id", "lon", "lat")
    for (p <- Seq(1, 4, 8, 11, 12)) {
      val got = df.select(col("id"), Geohash.encodeCol(col("lon"), col("lat"), p))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.foreach { case (id, lon, lat) =>
        assert(got(id) == Geohash.encode(lon, lat, p), s"p=$p id=$id")
      }
    }
  }

  test("column builder stays a single codegen projection (no UDF)") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 2.0)).toDF("id", "lon", "lat")
      .select(Geohash.encodeCol(col("lon"), col("lat"), 8))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF leaked into:\n$plan")
  }
}
