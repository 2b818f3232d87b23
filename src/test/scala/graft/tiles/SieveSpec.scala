package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sieve filter: largest-neighbor tie contract, single-pass semantics,
  * cross-tile regions, and the no-neighbor degenerate.
  */
class SieveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(spec: RasterSpec, minPx: Long)(f: (Int, Int) => Double) = {
    Vectorize.sieve(TileOps.createRaster(spark, spec)((x, y, _) => f(x, y)),
      spec, minPx)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
  }

  test("largest adjacent region wins; equal sizes tie to lowest region id") {
    // left half value 1, right half value 2 (23 px each after the island
    // bites one pixel from each), 2-px island of 9 straddling the middle
    val spec = RasterSpec(0.0, 4.0, 1.0, -1.0, 12, 4, 4, 1)
    def v(x: Int, y: Int): Double =
      if (y == 1 && (x == 5 || x == 6)) 9.0
      else if (x < 6) 1.0 else 2.0
    val out = run(spec, 3)(v)
    // equal neighbor sizes (23 = 23) → tie to the lowest region id:
    // region 1 contains global pixel 0
    assert(out((5, 1)) === 1.0 && out((6, 1)) === 1.0)
    assert(out((0, 0)) === 1.0 && out((11, 3)) === 2.0)
  }

  test("single-pass contract: enclosed small takes its (also-small) ring's value") {
    // A (value 5, 2 px) fully enclosed by a value-6 ring (10 px) inside
    // background 0; threshold 12 makes BOTH small. One pass on ORIGINAL
    // sizes: A's only neighbor is the ring → A becomes 6; the ring's
    // largest neighbor is background → 0. (GDAL's iterative sieve would
    // chain A to 0 as well — the one-pass contract is pinned here.)
    val spec = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 8, 1)
    def v(x: Int, y: Int): Double =
      if (y == 3 && (x == 3 || x == 4)) 5.0
      else if (y == 2 && x >= 2 && x <= 5) 6.0
      else if (y == 4 && x >= 2 && x <= 5) 6.0
      else if (y == 3 && (x == 2 || x == 5)) 6.0
      else 0.0
    val out = run(spec, 12)(v)
    assert(out((3, 3)) === 6.0 && out((4, 3)) === 6.0, "A should take the ring value")
    assert(out((2, 2)) === 0.0 && out((5, 4)) === 0.0, "ring should dissolve to bg")
  }

  test("one-region raster below threshold keeps its value (no neighbor)") {
    val spec = RasterSpec(0.0, 2.0, 1.0, -1.0, 2, 2, 2, 1)
    val out = run(spec, 100)((_, _) => 7.0)
    assert(out.values.toSet === Set(7.0))
  }

  test("cross-tile region counted whole: survives only via the merged size") {
    // a 2-px-tall strip spanning two tiles horizontally: 10 px total,
    // 5 px in each tile. Threshold 8: per-tile counts (5) would dissolve
    // it; the merged region (10) must survive.
    val spec = RasterSpec(0.0, 8.0, 1.0, -1.0, 16, 8, 8, 1)
    def v(x: Int, y: Int): Double =
      if (y == 3 && x >= 6 && x <= 10) 4.0
      else if (y == 4 && x >= 6 && x <= 10) 4.0
      else 0.0
    val out = run(spec, 8)(v)
    assert(out((6, 3)) === 4.0 && out((10, 4)) === 4.0, "merged region dissolved")
  }
}
