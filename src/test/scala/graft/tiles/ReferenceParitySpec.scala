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
}
