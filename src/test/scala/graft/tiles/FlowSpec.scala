package graft.tiles

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D8 flow direction + watershed sink resolution (Flow.scala). */
class FlowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Brute-force single-JVM D8 over a dense grid — the independent
    * reference for both the stencil and the tile-halo plumbing.
    */
  private def refFlowDir(z: Array[Array[Double]]): Array[Array[Int]] = {
    val h = z.length; val w = z(0).length
    Array.tabulate(h, w) { (y, x) =>
      var best = 0.0; var bestCode = 0
      for (((code, dx, dy, dist), _) <- Flow.D8.zipWithIndex) {
        val nx = x + dx; val ny = y + dy
        if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
          val drop = (z(y)(x) - z(ny)(nx)) / dist
          if (drop > best) { best = drop; bestCode = code }
        }
      }
      bestCode
    }
  }

  private def grid(spec: RasterSpec)(f: (Int, Int) => Double): Array[Array[Double]] =
    Array.tabulate(spec.height, spec.width)((y, x) => f(x, y))

  test("flowDir matches the brute-force reference across tile boundaries") {
    val spec = RasterSpec(0.0, 24.0, 1.0, -1.0, 24, 24, 8, 1)
    def dem(x: Int, y: Int): Double = ((x * 3 + y * 5) % 41).toDouble
    val ref = refFlowDir(grid(spec)(dem))
    val got = TileOps.toPixels(
        Flow.flowDir(TileOps.createRaster(spark, spec)((x, y, _) => dem(x, y))),
        spec.tileSize)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    assert(got.size === 24 * 24)
    for (y <- 0 until 24; x <- 0 until 24)
      assert(got((x, y)) === ref(y)(x).toDouble, s"($x,$y)")
  }

  test("uniform ramp drains east; plateau pits at 0; ties take the lowest code") {
    // z = -x: steepest (only positive) drop is due east -> code 1, except
    // the east edge, which has no lower in-bounds neighbor and pits
    val spec = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 4, 1)
    val ramp = TileOps.toPixels(
      Flow.flowDir(TileOps.createRaster(spark, spec)((x, _, _) => -x.toDouble)),
      4).collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    for (y <- 0 until 8; x <- 0 until 8)
      assert(ramp((x, y)) === (if (x == 7) 0.0 else 1.0), s"($x,$y)")
    // flat plane: no positive drop anywhere
    val flat = TileOps.toPixels(
      Flow.flowDir(TileOps.createRaster(spark, spec)((_, _, _) => 7.0)),
      4).collect().map(_.getDouble(3)).toSet
    assert(flat === Set(0.0))
    // center spike: every orthogonal neighbor drops by 1/1, diagonals by
    // 1/sqrt2 — the orthogonal four tie and E (code 1) must win
    val spike = TileOps.toPixels(
      Flow.flowDir(TileOps.createRaster(spark, spec)(
        (x, y, _) => if (x == 3 && y == 3) 1.0 else 0.0)),
      4).collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    assert(spike((3, 3)) === 1.0)
  }

  test("flowSinks resolves a west->east chain to the single pit with exact hops") {
    val spec = RasterSpec(0.0, 4.0, 1.0, -1.0, 16, 4, 4, 1)
    // z = 15 - x on every row: all pixels drain east, pit at x = 15
    val fd = Flow.flowDir(TileOps.createRaster(spark, spec)(
      (x, _, _) => (15 - x).toDouble))
    val out = Flow.flowSinks(TileOps.toPixels(fd, 4), width = 16, maxHops = 32)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(out.size === 64)
    for (y <- 0 until 4; x <- 0 until 16)
      assert(out((x, y)) === ((15, y, (15 - x).toLong)), s"($x,$y)")
  }

  test("flowSinks partitions the DEM fixture into pit-rooted watersheds") {
    val spec = RasterSpec(0.0, 32.0, 1.0, -1.0, 32, 32, 8, 1)
    def dem(x: Int, y: Int): Double = ((x * 3 + y * 5) % 41).toDouble
    val fd = Flow.flowDir(TileOps.createRaster(spark, spec)((x, y, _) => dem(x, y)))
    val px = TileOps.toPixels(fd, 8)
    val sinks = Flow.flowSinks(px, width = 32, maxHops = 64)
    val rows = sinks.collect().map(r =>
      ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getInt(3), r.getLong(4))))
    assert(rows.length === 32 * 32)
    val codes = px.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    rows.foreach { case ((x, y), (sx, sy, hops)) =>
      assert(codes((sx, sy)) === 0.0, s"sink of ($x,$y) is not a pit")
      if (codes((x, y)) == 0.0) assert((sx, sy, hops) === ((x, y, 0L)))
      else assert(hops >= 1L)
      // every hop strictly descends, so path length is bounded by the
      // elevation at the source
      assert(hops <= dem(x, y).toLong, s"($x,$y) hops $hops")
    }
    // parallelism determinism: same result at a different partitioning
    val again = Flow.flowSinks(px.repartition(13), width = 32, maxHops = 64)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(rows.toMap === again)
  }
}
