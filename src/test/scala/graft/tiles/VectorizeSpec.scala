package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class VectorizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("disconnected same-value regions stay separate (4-connectivity)") {
    // 32×32, tiles of 8: two 4×4 squares of value 1 on a 0 background,
    // placed so each square straddles a tile boundary
    val spec = RasterSpec(0.0, 32.0, 1.0, -1.0, 32, 32, 8, 1)
    def inSquare(x: Int, y: Int, x0: Int, y0: Int): Boolean =
      x >= x0 && x < x0 + 4 && y >= y0 && y < y0 + 4
    val tiles = TileOps.createRaster(spark, spec)((x, y, _) =>
      if (inSquare(x, y, 6, 6) || inSquare(x, y, 20, 14)) 1.0 else 0.0)
    val out = Vectorize.vectorize(tiles, spec).collect()
      .map(r => (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    // background is one connected region (squares don't cut it), + 2 squares
    assert(out.length == 3)
    val squares = out.filter(_._1 == 1.0)
    assert(squares.length == 2)
    assert(squares.forall(_._3 == 16L))
    val bg = out.filter(_._1 == 0.0)
    assert(bg.length == 1 && bg.head._3 == 32L * 32 - 32)
    // region keys: min pixel index of each square: (6,6) → 6*32+6; (20,14)
    assert(squares.map(_._2).toSet == Set(6L * 32 + 6, 14L * 32 + 20))
  }

  test("diagonal stripes merge across tiles into one region per value") {
    val spec = RasterSpec(0.0, 64.0, 1.0, -1.0, 64, 64, 16, 1)
    val tiles = TileOps.createRaster(spark, spec)((x, y, _) => ((x + y) / 16).toDouble)
    val out = Vectorize.vectorize(tiles, spec).collect()
    assert(out.length == 8) // (x+y) in [0,126] → stripes 0..7
    assert(out.map(_.getLong(3)).sum == 64L * 64)
  }

  // segments of ONE region from a boolean grid, in vectorizeRings'
  // emission convention (interior on the left; dirs 0=+x 1=-x 2=+y 3=-y)
  private def segsOf(grid: Set[(Int, Int)]): Array[(Long, Long, Int)] = {
    def in(x: Int, y: Int) = grid.contains((x, y))
    grid.toArray.flatMap { case (x, y) =>
      val b = collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      if (!in(x, y - 1)) b += ((x.toLong, y.toLong, 0))
      if (!in(x, y + 1)) b += ((x.toLong + 1, y.toLong + 1, 1))
      if (!in(x + 1, y)) b += ((x.toLong + 1, y.toLong, 2))
      if (!in(x - 1, y)) b += ((x.toLong, y.toLong + 1, 3))
      b
    }
  }

  test("ring tracer: single pixel, square with hole, pinch vertex") {
    // single pixel at (2,3)
    assert(Vectorize.traceWkt(segsOf(Set((2, 3)))) ===
      "POLYGON((2 3,3 3,3 4,2 4,2 3))")
    // 3×3 block minus center → outer square + unit hole
    val holed = (for (x <- 0 to 2; y <- 0 to 2 if (x, y) != ((1, 1))) yield (x, y)).toSet
    assert(Vectorize.traceWkt(segsOf(holed)) ===
      "POLYGON((0 0,3 0,3 3,0 3,0 0),(1 1,1 2,2 2,2 1,1 1))")
    // pinch: 3×3 minus (1,1) and (2,2) — the cavity at (1,1) connects to
    // the exterior through lattice vertex (2,2); the left-turn rule keeps
    // it ONE self-touching ring (area 7), not an outer + hole pair
    val pinch = holed - ((2, 2))
    val wkt = Vectorize.traceWkt(segsOf(pinch))
    assert(wkt.startsWith("POLYGON((") && !wkt.contains("),("),
      s"expected a single self-touching ring, got $wkt")
    val verts = wkt.stripPrefix("POLYGON((").stripSuffix("))").split(",")
    assert(verts.count(_ == "2 2") == 2, s"ring should pass (2 2) twice: $wkt")
  }

  test("vectorizeRings end-to-end: regions spanning tiles, hole, WKT shape") {
    val spec = RasterSpec(0.0, 32.0, 1.0, -1.0, 32, 32, 8, 1)
    // 6×6 square of 1s at (6,6) straddling tile corners, on a 0 background
    // → background polygon must carry the square as a HOLE
    val tiles = TileOps.createRaster(spark, spec)((x, y, _) =>
      if (x >= 6 && x < 12 && y >= 6 && y < 12) 1.0 else 0.0)
    val out = Vectorize.vectorizeRings(tiles, spec).collect()
      .map(r => (r.getDouble(1), r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(out.length === 2)
    val (bg, sq) = (out(0), out(1))
    assert(sq === ((1.0, 36L, "POLYGON((6 6,12 6,12 12,6 12,6 6))")))
    assert(bg._1 === 0.0 && bg._2 === (32L * 32 - 36))
    assert(bg._3 ===
      "POLYGON((0 0,32 0,32 32,0 32,0 0),(6 6,6 12,12 12,12 6,6 6))")
    // geoCoords applies the geotransform (origin (0,32), pixel 1×-1)
    val geo = Vectorize.vectorizeRings(tiles, spec, geoCoords = true).collect()
      .map(r => (r.getDouble(1), r.getString(4))).sortBy(_._1)
    assert(geo(1)._2 === "POLYGON((6.0 26.0,12.0 26.0,12.0 20.0,6.0 20.0,6.0 26.0))")
  }

  test("distributed CC path: high-diameter snake region resolves in star-contraction rounds") {
    // VERDICT r4 #6: the old distributed fallback was plain min-label
    // propagation — O(diameter) supersteps; a boustrophedon "snake" of
    // 1-pixel-wide corridors has label-graph diameter ~ the tile count.
    // Force the distributed path (driverEdges = 0) and assert the snake
    // still resolves to ONE region — under label propagation with the
    // default iteration budget (32) this diameter would NOT converge.
    val spec = RasterSpec(0.0, 64.0, 1.0, -1.0, 64, 64, 4, 1) // 16×16 tiles
    // snake: even rows fully 1; odd row y connects at right edge when
    // (y/2) even, left edge when odd → one serpentine region, diameter
    // ~ 32 row segments × 16 tiles each
    val tiles = TileOps.createRaster(spark, spec) { (x, y, _) =>
      if (y % 2 == 0) 1.0
      else if ((y / 2) % 2 == 0 && x == 63) 1.0
      else if ((y / 2) % 2 == 1 && x == 0) 1.0
      else 0.0
    }
    spark.conf.set("graft.vectorize.driverEdges", "0")
    try {
      val out = Vectorize.vectorize(tiles, spec).collect()
        .map(r => (r.getDouble(1), r.getLong(3))).sortBy(_._1)
      val snake = out.filter(_._1 == 1.0)
      assert(snake.length == 1, s"snake fragmented: ${snake.length} regions")
      assert(snake.head._2 == 64L * 32 + 32L) // even rows + 1-px connectors
    } finally spark.conf.unset("graft.vectorize.driverEdges")
  }

  test("vertical band edges pair correctly (bbox of merged region)") {
    val spec = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, 4, 1)
    // vertical halves: x<8 → 0, else 1 — each half spans 2×4 tiles
    val tiles = TileOps.createRaster(spark, spec)((x, _, _) => if (x < 8) 0.0 else 1.0)
    val out = Vectorize.vectorize(tiles, spec).collect()
      .map(r => (r.getDouble(1), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((0.0, 0L, 7L, 0L, 15L), (1.0, 8L, 15L, 0L, 15L)))
  }
}
