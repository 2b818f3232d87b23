package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Direct ports of the reference's own pinned convolution test values
  * (reference: tests/tests_array/test_array_convolution.py:13-119) —
  * row-for-row parity with the numbers buteo's test suite asserts.
  */
object ReferenceParityFixtures extends Serializable {
  // the reference fixture: 3×3 array [[1,2,3],[4,5,6],[7,8,9]] (+9/band)
  def ref3x3(x: Int, y: Int, b: Int): Double = (y * 3 + x + 1).toDouble + b * 9.0

  // the reference's plus-shaped kernel: center 0.5, 4-neighbors 0.125
  val plusKernel: (Int, Int) => Double = (dx, dy) =>
    if (dx == 0 && dy == 0) 0.5
    else if (math.abs(dx) + math.abs(dy) == 1) 0.125
    else 0.0
}

class ReferenceParitySpec extends AnyFunSuite {
  import ReferenceParityFixtures._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val spec1 = RasterSpec(0.0, 3.0, 1.0, -1.0, 3, 3, 4, 1)

  private def pixels(ds: org.apache.spark.sql.Dataset[Tile]): Map[(Int, Int), Double] =
    ds.collect().flatMap { t =>
      for (r <- 0 until t.h; c <- 0 until t.w)
        yield (t.cellX * 4 + c, t.cellY * 4 + r) -> t.pixels(r * t.w + c)
    }.toMap

  test("convolve_array plus-kernel sum pins the reference's center value (=5.0)") {
    // test_convolve_array_simple: center = 5*0.5 + 6*0.125 + 8*0.125 +
    // 4*0.125 + 2*0.125 = 5.0 (test_array_convolution.py:73-81)
    val tiles = TileOps.createRaster(spark, spec1)(ref3x3)
    val out = pixels(TileOps.convolve(tiles, 1, "sum",
      weight = plusKernel, normalised = false))
    assert(math.abs(out((1, 1)) - 5.0) < 1e-9)
  }

  test("convolve_array edge renormalization at the corner (main path semantics)") {
    // _convolve_array_2D renormalizes present weights to the kernel total
    // when offsets leave the array (convolution/base.py:153-156): corner
    // present weights {0.5, 0.125, 0.125} → ×(1/0.75); value =
    // (1*0.5 + 2*0.125 + 4*0.125)/0.75 = 1.25/0.75 = 5/3
    val tiles = TileOps.createRaster(spark, spec1)(ref3x3)
    val out = pixels(TileOps.convolve(tiles, 1, "sum",
      weight = plusKernel, normalised = false))
    assert(math.abs(out((0, 0)) - 1.25 / 0.75) < 1e-9)
  }

  test("convolve_array_channels mean reduces across bands per pixel") {
    // test_convolve_array_channels_HWC (:89-99): per-pixel mean of the 2
    // channels of [[1..9],[10..18]] → v + 4.5
    val spec2 = spec1.copy(bands = 2)
    val tiles = TileOps.createRaster(spark, spec2)(ref3x3)
    val out = pixels(TileOps2.bandReduce(tiles, "mean"))
    for (y <- 0 until 3; x <- 0 until 3) {
      val v = (y * 3 + x + 1).toDouble
      assert(out((x, y)) == (v + (v + 9.0)) / 2, s"($x,$y)")
    }
  }

  test("band reduce sum/min/max/median pin the channel enum") {
    val spec2 = spec1.copy(bands = 2)
    val tiles = TileOps.createRaster(spark, spec2)(ref3x3)
    val sums = pixels(TileOps2.bandReduce(tiles, "sum"))
    val mins = pixels(TileOps2.bandReduce(tiles, "min"))
    val maxs = pixels(TileOps2.bandReduce(tiles, "max"))
    for (y <- 0 until 3; x <- 0 until 3) {
      val v = (y * 3 + x + 1).toDouble
      assert(sums((x, y)) == v + v + 9.0)
      assert(mins((x, y)) == v)
      assert(maxs((x, y)) == v + 9.0)
    }
  }

  private val spec5 = RasterSpec(0.0, 5.0, 1.0, -1.0, 5, 5, 5, 1)
  private def pix5(ds: org.apache.spark.sql.Dataset[Tile]): Map[(Int, Int), Double] =
    ds.collect().flatMap { t =>
      for (r <- 0 until t.h; c <- 0 until t.w)
        yield (c, r) -> t.pixels(r * t.w + c)
    }.toMap

  test("convolve_distance pins the reference's own binary fixture " +
       "(test_array_distance.py:26-45)") {
    // targets at (1,1) and (3,3) on a 5×5 zero plane, target=1
    val bin = TileOps.createRaster(spark, spec5)(
      (x, y, _) => if ((x == 1 && y == 1) || (x == 3 && y == 3)) 1.0 else 0.0)
    val maxD = math.sqrt(50.0) // reference default: sqrt(h² + w²)
    val d = pix5(TileOps3.distanceTransformEuclid(bin, 1.0, maxD))
    assert(d((1, 1)) == 0.0 && d((3, 3)) == 0.0)        // :34-35
    assert(math.abs(d((0, 0)) - math.sqrt(2.0)) < 1e-5) // :39
    assert(math.abs(d((2, 2)) - math.sqrt(2.0)) < 1e-5) // :42
    // maximum_distance clamp (:45 region): with maxDist=1 the diagonal
    // neighbors are out of range and take maxDist itself
    val clamped = pix5(TileOps3.distanceTransformEuclid(bin, 1.0, 1.0))
    assert(clamped((0, 0)) == 1.0)
    assert(clamped((0, 1)) == 1.0) // orthogonal neighbor of (1,1): exactly 1
  }

  test("convolve_distance multi-value fixture: nearest target-valued pixel " +
       "(test_array_distance.py:49-69)") {
    // 2.0 at (1,1) and (4,0); 3.0 at (3,3); distance to value 2
    val arr = TileOps.createRaster(spark, spec5)((x, y, _) =>
      if (x == 1 && y == 1) 2.0
      else if (x == 3 && y == 3) 3.0
      else if (x == 0 && y == 4) 2.0 // numpy arr[4,0] = (row 4, col 0)
      else 0.0)
    val d = pix5(TileOps3.distanceTransformEuclid(arr, 2.0, math.sqrt(50.0)))
    assert(d((1, 1)) == 0.0 && d((0, 4)) == 0.0)              // :53-54
    assert(d((3, 3)) > 0.0)                                    // :57
    assert(math.abs(d((3, 3)) - 2.0 * math.sqrt(2.0)) < 1e-5)  // :60
  }

  test("morphology pins the reference's binary square fixture " +
       "(test_array_morphology.py:45-105)") {
    // 7×7 plane, ones on [2,4]×[2,4]
    val spec7 = RasterSpec(0.0, 7.0, 1.0, -1.0, 7, 7, 7, 1)
    val bin = TileOps.createRaster(spark, spec7)(
      (x, y, _) => if (x >= 2 && x <= 4 && y >= 2 && y <= 4) 1.0 else 0.0)
    def p(ds: org.apache.spark.sql.Dataset[Tile]) =
      ds.collect().flatMap { t =>
        for (r <- 0 until t.h; c <- 0 until t.w) yield (c, r) -> t.pixels(r * t.w + c)
      }.toMap
    // erode r1: the 3×3 square erodes to its single center pixel (:57-58)
    val er = p(TileOps2.erode(bin, 1))
    assert(er((3, 3)) == 1.0)
    assert(er.values.sum == 1.0)
    // erode r2: everything gone (:63)
    assert(p(TileOps2.erode(bin, 2)).values.sum == 0.0)
    // dilate r1: the full 5×5 square [1,5]² is set (:92-100)
    val di = p(TileOps2.dilate(bin, 1))
    for (i <- 1 to 5; j <- 1 to 5) assert(di((i, j)) == 1.0, s"($i,$j)")
    // dilate r2 grows further (:104-105)
    assert(p(TileOps2.dilate(bin, 2)).values.sum > di.values.sum)
  }

  test("timeseries slope pins the reference's linear fixture " +
       "(test_array_timeseries.py:11-78)") {
    // 5×5×10: pixel (i,j) holds the series t·0.1·(i+j); OLS slope must
    // recover 0.1·(i+j) to 5 decimals
    val specT = RasterSpec(0.0, 5.0, 1.0, -1.0, 5, 5, 5, 10)
    val ts = TileOps.createRaster(spark, specT)(
      (x, y, b) => b.toDouble * 0.1 * (x + y))
    val slope = pix5(TileOps2.timeSlope(ts, 10))
    for (i <- 0 until 5; j <- 0 until 5)
      assert(math.abs(slope((i, j)) - 0.1 * (i + j)) < 1e-5, s"($i,$j)")
  }

  test("Theil–Sen shrugs off the reference's outlier fixture " +
       "(test_array_timeseries.py:47-63,131-145)") {
    // same series but time step 5 multiplied by 10 — the robust slope
    // still recovers 0.1·(i+j) where OLS is dragged off
    val specT = RasterSpec(0.0, 5.0, 1.0, -1.0, 5, 5, 5, 10)
    val ts = TileOps.createRaster(spark, specT) { (x, y, b) =>
      val v = b.toDouble * 0.1 * (x + y)
      if (b == 5) v * 10.0 else v
    }
    val robust = pix5(TileOps2.theilSenSlope(ts, 10))
    val ols = pix5(TileOps2.timeSlope(ts, 10))
    for (i <- 0 until 5; j <- 0 until 5) {
      val want = 0.1 * (i + j)
      assert(math.abs(robust((i, j)) - want) < 1e-5, s"robust ($i,$j)")
      if (i + j > 0) // OLS on the corrupted series misses (sanity contrast)
        assert(math.abs(ols((i, j)) - want) > 0.1 * want)
    }
  }
}
