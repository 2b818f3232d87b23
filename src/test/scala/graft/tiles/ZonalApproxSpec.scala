package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{BBox, Polygon}

class ZonalApproxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("approx zonal stats track the exact histogram path on a continuous raster") {
    val spec = RasterSpec(0.0, 64.0, 1.0, -1.0, 64, 64, 16, 1)
    // near-continuous values: base pattern + dense fractional term
    val tiles = TileOps.createRaster(spark, spec)((x, y, _) =>
      ((x * 7 + y * 13) % 97).toDouble + ((x * 31 + y * 17) % 101) / 101.0)
    val zones = Seq(
      (1L, Polygon.box(BBox(0, 30, 0, 30))),
      (2L, Polygon.box(BBox(20, 64, 10, 50))))

    val exact = Zonal.zonalStatsFull(tiles, zones).collect()
      .map(r => (r.getLong(0), r)).toMap
    val approx = Zonal.zonalStatsApprox(tiles, zones).collect()
    assert(approx.length === exact.size)

    approx.foreach { a =>
      val e = exact(a.getLong(0))
      // moments are EXACT (same power-sum math)
      Seq("n_px", "vmin", "vmax", "vsum", "vrange", "mean", "variance",
        "std", "skew", "kurtosis", "snr", "eff", "cv").foreach { f =>
        val av = a.get(a.fieldIndex(f)) match {
          case l: Long => l.toDouble; case d: Double => d
        }
        val ev = e.get(e.fieldIndex(f)) match {
          case l: Long => l.toDouble; case d: Double => d
        }
        assert(math.abs(av - ev) <= 1e-9 * math.max(1.0, math.abs(ev)),
          s"zone ${a.getLong(0)} $f: approx $av vs exact $ev")
      }
      // order stats within 2% of the exact interpolated quantiles
      Seq("median", "q02", "q1", "q3", "q98", "iqr", "mad").foreach { f =>
        val av = a.getDouble(a.fieldIndex(f))
        val ev = e.getDouble(e.fieldIndex(f))
        val tol = 0.02 * math.max(1.0, math.abs(ev))
        assert(math.abs(av - ev) <= tol,
          s"zone ${a.getLong(0)} $f: approx $av vs exact $ev")
      }
    }
  }

  test("zonalBinnedMode: dominant value lands in the fullest bin") {
    import graft.geo.{BBox, Polygon}
    val spec = RasterSpec(0.0, 32.0, 1.0, -1.0, 32, 32, 16, 1)
    val r = TileOps.createRaster(spark, spec)((x, y, _) =>
      if ((x + y) % 3 == 0) 4.0 else ((x * 7 + y * 5) % 10).toDouble)
    val zones = Seq((1L, Polygon.box(BBox(0.0, 32.0, 0.0, 32.0))))
    val out = Zonal.zonalBinnedMode(r, zones).collect()
    assert(out.length == 1)
    val m = out(0).getAs[Double]("mode_binned")
    // dominant value 4 → the fullest 256-bin's center is within one bin
    assert(math.abs(m - 4.0) <= 9.0 / 256.0 + 1e-9, s"mode_binned $m")
  }
}
