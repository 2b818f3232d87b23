package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Marching-squares contour segments: geometric invariants (endpoints
  * interpolate to the level, segments stay inside their cell, vertex
  * degrees close the loops) plus the tile-ownership certificate — the
  * output must be identical at any tile size, or the halo walk
  * double-emits / drops boundary cells.
  */
object ContoursSpec {
  // companion-hosted fixture so Spark closures don't capture the suite
  val W = 48
  def z(x: Int, y: Int): Double = ((x * 3 + y * 5) % 41).toDouble
  val Level = 20.5
}

class ContoursSpec extends AnyFunSuite {
  import ContoursSpec.{W, z, Level}

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def segsAt(tileSize: Int): Set[(Int, Int, Int, Double, Double, Double, Double)] = {
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, W, W, tileSize, 1)
    val dem = TileOps.createRaster(spark, spec)((x, y, _) => z(x, y))
    Contours.contourSegments(dem, tileSize, Level).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSet
  }

  lazy val segs: Set[(Int, Int, Int, Double, Double, Double, Double)] = segsAt(16)

  test("tile-size invariance: 8 / 16 / 48 produce the identical segment set") {
    assert(segs.nonEmpty)
    assert(segsAt(8) === segs)
    assert(segsAt(48) === segs) // single tile — no halo at all
  }

  test("every endpoint linearly interpolates to the level on a cell edge") {
    def check(px: Double, py: Double): Unit = {
      val xi = px == math.floor(px); val yi = py == math.floor(py)
      assert(xi || yi, s"($px,$py) not on a grid edge")
      if (!xi) { // horizontal edge: y integer, x fractional
        val x0 = math.floor(px).toInt; val y0 = py.toInt
        val v = z(x0, y0) + (px - x0) * (z(x0 + 1, y0) - z(x0, y0))
        assert(math.abs(v - Level) < 1e-9, s"($px,$py) -> $v")
      } else if (!yi) {
        val x0 = px.toInt; val y0 = math.floor(py).toInt
        val v = z(x0, y0) + (py - y0) * (z(x0, y0 + 1) - z(x0, y0))
        assert(math.abs(v - Level) < 1e-9, s"($px,$py) -> $v")
      } else fail(s"endpoint ($px,$py) on a grid VERTEX — integer pixels " +
        "with a .5 level can never produce a vertex hit")
    }
    segs.foreach { case (_, _, _, x0, y0, x1, y1) => check(x0, y0); check(x1, y1) }
  }

  test("segments stay inside their 2x2 cell and match the mask census") {
    segs.foreach { case (cx, cy, _, x0, y0, x1, y1) =>
      for ((px, py) <- Seq((x0, y0), (x1, y1))) {
        assert(px >= cx && px <= cx + 1 && py >= cy && py <= cy + 1,
          s"endpoint ($px,$py) escapes cell ($cx,$cy)")
      }
    }
    // per-cell segment count: saddles 2, plain crossings 1
    for (x <- 0 until W - 1; y <- 0 until W - 1) {
      var mask = 0
      if (z(x, y) > Level) mask |= 1
      if (z(x + 1, y) > Level) mask |= 2
      if (z(x + 1, y + 1) > Level) mask |= 4
      if (z(x, y + 1) > Level) mask |= 8
      val want = if (mask == 0 || mask == 15) 0
        else if (mask == 5 || mask == 10) 2 else 1
      val got = segs.count(s => s._1 == x && s._2 == y)
      assert(got === want, s"cell ($x,$y) mask $mask")
    }
  }

  test("vertex degrees: 2 everywhere except raster-border exits (degree 1)") {
    val deg = scala.collection.mutable.Map.empty[(Double, Double), Int]
    segs.foreach { case (_, _, _, x0, y0, x1, y1) =>
      deg((x0, y0)) = deg.getOrElse((x0, y0), 0) + 1
      deg((x1, y1)) = deg.getOrElse((x1, y1), 0) + 1
    }
    deg.foreach { case ((px, py), d) =>
      val border = px == 0.0 || py == 0.0 || px == (W - 1).toDouble ||
        py == (W - 1).toDouble
      if (border) assert(d === 1, s"border vertex ($px,$py) degree $d")
      else assert(d === 2, s"interior vertex ($px,$py) degree $d — open contour")
    }
  }
}
