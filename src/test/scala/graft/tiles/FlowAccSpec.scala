package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object FlowAccSpec {
  val W = 48
  def zMod(x: Int, y: Int): Double = ((x * 3 + y * 5) % 41).toDouble
  def zRamp(x: Int, y: Int): Double = (W - x).toDouble

  /** Single-threaded reference: D8 argmax (same tie-break contract as
    * Flow.flowDir), then every cell's path walked one hop at a time with
    * +1 dropped on each strictly-downstream cell.
    */
  def bruteAcc(z: (Int, Int) => Double): Map[(Int, Int), Long] = {
    val codes = Array.tabulate(W, W) { (x, y) =>
      var best = 0.0; var bestCode = 0
      for ((code, dx, dy, dist) <- Flow.D8) {
        val nx = x + dx; val ny = y + dy
        if (nx >= 0 && nx < W && ny >= 0 && ny < W) {
          val drop = (z(x, y) - z(nx, ny)) / dist
          if (drop > best) { best = drop; bestCode = code }
        }
      }
      bestCode
    }
    val acc = scala.collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    val delta = Flow.D8.map(d => d._1 -> (d._2, d._3)).toMap
    for (x <- 0 until W; y <- 0 until W) {
      var cx = x; var cy = y
      while (codes(cx)(cy) != 0) {
        val (dx, dy) = delta(codes(cx)(cy))
        cx += dx; cy += dy
        acc((cx, cy)) += 1L
      }
    }
    (for (x <- 0 until W; y <- 0 until W) yield (x, y) -> acc((x, y))).toMap
  }
}

/** Flow accumulation (TauDEM-style tile condensation) against a
  * single-threaded path-walking reference, at several tile sizes — the
  * tile-ownership certificate for the entry/exit condensation — plus a
  * pure-ramp DEM whose single 47-hop west→east chains cross 6 tiles,
  * forcing the cross-tile frontier through multiple forwarding rounds.
  */
class FlowAccSpec extends AnyFunSuite {
  import FlowAccSpec._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sparkAcc(z: (Int, Int) => Double, tileSize: Int): Map[(Int, Int), Long] = {
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, W, W, tileSize, 1)
    val dem = TileOps.createRaster(spark, spec)((x, y, _) => z(x, y))
    Flow.flowAccumulation(Flow.flowDir(dem), tileSize, width = W)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  test("modular DEM matches the path-walking reference at tile sizes 8/16/48") {
    val want = bruteAcc(zMod)
    for (ts <- Seq(8, 16, 48)) {
      val got = sparkAcc(zMod, ts)
      assert(got.size === W * W, s"ts=$ts")
      assert(got === want, s"ts=$ts")
    }
  }

  test("ramp DEM: 47-hop chains crossing 6 tiles accumulate exactly") {
    val got = sparkAcc(zRamp, 8)
    for (x <- 0 until W; y <- 0 until W)
      assert(got((x, y)) === x.toLong, s"cell ($x,$y)")
  }

  test("pits accumulate their whole catchment; total inflow is conserved") {
    val want = bruteAcc(zMod)
    // every non-pit cell's unit lands somewhere downstream exactly once
    // per path cell, so Σ acc = Σ path lengths — cross-check the spark
    // totals sum against the reference sum (an aggregate-level guard
    // independent of the per-cell compare above)
    val got = sparkAcc(zMod, 16)
    assert(got.values.sum === want.values.sum)
    assert(got.values.max === want.values.max)
  }
}
