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

  test("castDtype: GDAL round-half-away, clamps, nodata re-base") {
    // values cycle ties and out-of-range in both directions
    val vals = Array(2.5, -2.5, 3.49, -3.49, 300.0, -5.0, -9999.0 /* nodata */)
    val spec1 = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 8, 1)
    val src = TileOps.createRaster(spark, spec1)(
      (x, y, _) => vals((x + y * 8) % vals.length))

    // uint8: -9999 sentinel does not fit -> re-based to 255 (the
    // reference's own uint8 default); half-away ties; clamp both ends
    val u8 = TileOps2.castDtype(src, "uint8").collect()(0)
    val exp8 = Map(2.5 -> 3.0, -2.5 -> 0.0, 3.49 -> 3.0, -3.49 -> 0.0,
      300.0 -> 255.0, -5.0 -> 0.0, -9999.0 -> 255.0)
    assert(u8.nodata == 255.0)
    // row-major single tile: pixel i is (x=i%8, y=i/8), so value index
    // (x + y*8) = i
    for (i <- u8.pixels.indices)
      assert(u8.pixels(i) == exp8(vals(i % vals.length)), s"px $i")

    // int16: sentinel fits and is carried; negatives round half-away
    val i16 = TileOps2.castDtype(src, "int16").collect()(0)
    assert(i16.nodata == -9999.0)
    val exp16 = Map(2.5 -> 3.0, -2.5 -> -3.0, 3.49 -> 3.0, -3.49 -> -3.0,
      300.0 -> 300.0, -5.0 -> -5.0, -9999.0 -> -9999.0)
    for (i <- i16.pixels.indices)
      assert(i16.pixels(i) == exp16(vals(i % vals.length)))

    // float32: values pass through unrounded
    val f32 = TileOps2.castDtype(src, "float32").collect()(0)
    for (i <- f32.pixels.indices)
      assert(f32.pixels(i) == vals(i % vals.length))

    // a NON-INTEGRAL sentinel in range (100.5 fits uint8's range but not
    // its lattice) must still re-base — valueFits, not just fitsRange
    val spec2 = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 8, 1, nodata = 100.5)
    val src2 = TileOps.createRaster(spark, spec2)((x, _, _) =>
      if (x == 0) 100.5 else 7.0)
    val u8b = TileOps2.castDtype(src2, "uint8").collect()(0)
    assert(u8b.nodata == 255.0)
    assert(u8b.pixels.count(_ == 255.0) == 8) // the x==0 column followed the sentinel
    assert(u8b.pixels.count(_ == 7.0) == 56)
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

  test("dem slope/aspect/hillshade match a straight-Scala Horn oracle") {
    val spec = RasterSpec(0.0, 16.0, 0.25, -0.25, 16, 16, 8, 1)
    def z(x: Int, y: Int): Double = ((x * 3 + y * 5) % 17).toDouble
    val dem = TileOps.createRaster(spark, spec)((x, y, _) => z(x, y))
    def zc(x: Int, y: Int): Double =
      z(math.max(0, math.min(15, x)), math.max(0, math.min(15, y)))
    def grad(x: Int, y: Int): (Double, Double) = {
      // mirror hornGradients' center-fallback clamp
      def at(dx: Int, dy: Int): Double =
        if (x + dx < 0 || x + dx > 15 || y + dy < 0 || y + dy > 15) z(x, y)
        else zc(x + dx, y + dy)
      val gx = ((at(1, -1) + 2.0 * at(1, 0) + at(1, 1)) -
        (at(-1, -1) + 2.0 * at(-1, 0) + at(-1, 1))) / (8.0 * 0.25)
      val gy = ((at(-1, 1) + 2.0 * at(0, 1) + at(1, 1)) -
        (at(-1, -1) + 2.0 * at(0, -1) + at(1, -1))) / (8.0 * 0.25)
      (gx, gy)
    }
    val slope = TileOps.toPixels(TileOps2.demSlope(dem), 8).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    val shade = TileOps.toPixels(TileOps2.demHillshade(dem), 8).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    for (x <- 0 until 16; y <- 0 until 16) {
      val (gx, gy) = grad(x, y)
      val expSlope = math.toDegrees(math.atan(math.sqrt(gx * gx + gy * gy)))
      assert(math.abs(slope((x, y)) - expSlope) < 1e-9, s"slope($x,$y)")
      val alt = math.toRadians(45.0); val az = math.toRadians(315.0)
      val sl = math.atan(math.sqrt(gx * gx + gy * gy))
      val asp = math.atan2(gy, -gx)
      val expShade = math.max(0.0, 255.0 * (math.sin(alt) * math.cos(sl) +
        math.cos(alt) * math.sin(sl) * math.cos(az - math.Pi / 2.0 - asp)))
      assert(math.abs(shade((x, y)) - expShade) < 1e-9, s"shade($x,$y)")
    }
    // aspect: flat pixels report 0, gradients give [0, 360)
    val aspect = TileOps.toPixels(TileOps2.demAspect(dem), 8).collect()
      .map(_.getDouble(3))
    assert(aspect.forall(a => a >= 0.0 && a < 360.0))
  }

  test("demOrientation equals the aspect/slope composition, height flags honoured") {
    val spec = RasterSpec(0.0, 16.0, 0.25, -0.25, 16, 16, 8, 1)
    def z(x: Int, y: Int): Double = ((x * 3 + y * 5) % 17).toDouble
    val dem = TileOps.createRaster(spark, spec)((x, y, _) => z(x, y))
    def byBand(ds: org.apache.spark.sql.Dataset[Tile]): Map[(Int, Int, Int), Double] =
      TileOps.toPixels(ds, 8).collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3))).toMap
    val orient = byBand(TileOps2.demOrientation(dem))
    val aspect = byBand(TileOps2.demAspect(dem))
    val slopePct = byBand(TileOps2.demSlope(dem, percent = true))
    for (x <- 0 until 16; y <- 0 until 16) {
      val a = aspect((x, y, 0))
      val an = if (a != 0.0) a / 360.0 else 0.0
      assert(math.abs(orient((x, y, 0)) - (math.sin(2 * math.Pi * an) + 1) / 2) < 1e-12)
      assert(math.abs(orient((x, y, 1)) - (math.cos(2 * math.Pi * an) + 1) / 2) < 1e-12)
      val sp = slopePct((x, y, 0))
      val expSl = if (sp == 0.0) 0.0 else math.min(1.0, math.max(0.0, sp / 90.0))
      assert(math.abs(orient((x, y, 2)) - expSl) < 1e-12)
      val h = z(x, y)
      assert(orient((x, y, 3)) == (if (h != 0.0) h / 8849.0 else 0.0))
    }
    // flags: no height band / raw height band
    assert(!TileOps2.demOrientation(dem, includeHeight = false)
      .collect().exists(_.band == 3))
    val raw = byBand(TileOps2.demOrientation(dem, heightNorm = false))
    assert(raw((3, 4, 3)) == z(3, 4))
  }

  test("findCommonProjection majority vote with smaller-EPSG tie break") {
    val a = RasterSpec(0, 0, 1, -1, 8, 8, 8, 1, crs = 4326)
    val b = a.copy(crs = 3857)
    assert(TileOps2.findCommonProjection(Seq(a, a, b)) == 4326)
    assert(TileOps2.findCommonProjection(Seq(a, b)) == 3857)
  }

  test("normalizedDiff computes (bA-bB)/(bA+bB) with the zero-sum guard") {
    val spec = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, 8, 2)
    // band 0: x, band 1: y — pixel (0,0) has sum 0 and must yield 0
    val r = TileOps.createRaster(spark, spec)((x, y, b) =>
      if (b == 0) x.toDouble else y.toDouble)
    val got = TileOps.toPixels(TileOps2.normalizedDiff(r, bandA = 1, bandB = 0), 8)
      .collect().map(row => ((row.getInt(0), row.getInt(1)), row.getDouble(3))).toMap
    assert(got.size == 256)
    for (x <- 0 until 16; y <- 0 until 16) {
      val want = if (x + y == 0) 0.0 else (y.toDouble - x) / (y.toDouble + x)
      assert(got((x, y)) == want, s"ndvi($x,$y)")
    }
    // swapping the bands flips the sign
    val swapped = TileOps.toPixels(TileOps2.normalizedDiff(r, bandA = 0, bandB = 1), 8)
      .collect().map(row => ((row.getInt(0), row.getInt(1)), row.getDouble(3))).toMap
    for (x <- 1 until 16; y <- 0 until 16)
      assert(swapped((x, y)) == -got((x, y)), s"sign($x,$y)")
  }
}
