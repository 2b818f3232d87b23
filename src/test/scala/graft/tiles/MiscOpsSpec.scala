package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MiscOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val spec3 = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, 8, 3)

  test("hsl <-> rgb round trip (within float tolerance)") {
    val rgb = TileOps.createRaster(spark, spec3)(
      (x, y, b) => ((x * 7 + y * 13 + b * 5) % 97).toDouble / 96.0)
    val back = TileOps2.hslToRgb(TileOps2.rgbToHsl(rgb))
    val orig = rgb.collect().map(t => ((t.cellX, t.cellY, t.band), t.pixels)).toMap
    back.collect().foreach { t =>
      val o = orig((t.cellX, t.cellY, t.band))
      var i = 0
      while (i < o.length) {
        assert(math.abs(o(i) - t.pixels(i)) < 1e-9,
          s"band ${t.band} px $i: ${o(i)} vs ${t.pixels(i)}")
        i += 1
      }
    }
  }

  test("dtype nodata defaults and ranges pin the reference table") {
    assert(Dtypes.defaultNodata("uint8") == 255.0)
    assert(Dtypes.defaultNodata("int16") == -32767.0)
    assert(Dtypes.defaultNodata("float32") == -9999.0)
    assert(Dtypes.valueRange("uint16") == ((0.0, 65535.0)))
    assert(Dtypes.fitsRange("uint8", 0, 255) && !Dtypes.fitsRange("uint8", -1, 10))
    assert(Dtypes.valueFits("int16", 1234.0) && !Dtypes.valueFits("int16", 12.5))
    assertThrows[IllegalArgumentException](Dtypes.defaultNodata("bogus"))
  }

  test("randomPatches: deterministic per seed, disjoint seeds differ") {
    val tiles = TileOps.createRaster(spark, spec3)((x, y, b) => (x + y + b).toDouble)
    def keys(seed: Long) = TileOps2.randomPatches(tiles, 5, seed).collect()
      .map(t => (t.cellX, t.cellY, t.band)).toSeq
    assert(keys(42) == keys(42))
    assert(keys(42).size == 5)
    assert(keys(42) != keys(43))
  }

  test("weighted convolve with a gaussian circular kernel matches a hand loop") {
    val spec = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 8, 1)
    def v(x: Int, y: Int): Double = ((x * 3 + y * 7) % 13).toDouble
    val tiles = TileOps.createRaster(spark, spec)((x, y, _) => v(x, y))
    val k = Kernels.base(1.5, circular = true, distanceWeighted = true, method = 3)
    val got = TileOps.convolve(tiles, 1, "mean", weight = k).collect().head
    // hand oracle at interior pixel (3,3): weighted mean over 3x3
    def w(dx: Int, dy: Int): Double = k(dx, dy)
    var s = 0.0; var ws = 0.0
    for (dy <- -1 to 1; dx <- -1 to 1) { s += v(3 + dx, 3 + dy) * w(dx, dy); ws += w(dx, dy) }
    // kernel is normalised inside convolve; weighted mean is scale-invariant
    assert(math.abs(got.pixels(3 * 8 + 3) - s / ws) < 1e-12)
  }

  test("sobel on a linear ramp gives constant gradient magnitude in the interior") {
    val spec = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, 8, 1)
    val tiles = TileOps.createRaster(spark, spec)((x, _, _) => 3.0 * x)
    val out = TileOps.toPixels(TileOps2.sobelEdges(tiles), 8).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    // gx of 3x ramp with sobel = -(3*4)*... magnitude = |(a+2d+g)-(c+2f+i)| = 4*3 = 12... times 2? compute: left col sum = 3(x-1)*4, right = 3(x+1)*4 → gx = -24; gy = 0 → mag 24
    for (x <- 1 until 15; y <- 1 until 15)
      assert(out((x, y)) == 24.0, s"($x,$y) -> ${out((x, y))}")
  }

  test("findCommonProjection majority vote with smaller-EPSG tie break") {
    val a = RasterSpec(0, 0, 1, -1, 8, 8, 8, 1, crs = 4326)
    val b = a.copy(crs = 3857)
    assert(TileOps2.findCommonProjection(Seq(a, a, b)) == 4326)
    assert(TileOps2.findCommonProjection(Seq(a, b)) == 3857)
  }
}
