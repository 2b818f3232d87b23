package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Proj

class TileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("reproject 4326->3857 matches a straight-Scala oracle loop") {
    val src = RasterSpec(0.0, 64.0, 0.25, -0.25, 128, 128, 32, 1)
    val dst = RasterSpec(0.0, 9000000.0, 30000.0, -30000.0, 120, 120, 30, 1, crs = 3857)
    def value(x: Int, y: Int, b: Int): Double = ((x * 7 + y * 13) % 97).toDouble
    val tiles = TileOps.createRaster(spark, src)(value)
    val got = TileOps2.reproject(tiles, src, dst).collect()
      .flatMap { t =>
        for (r <- 0 until t.h; c <- 0 until t.w)
          yield ((t.cellX * dst.tileSize + c, t.cellY * dst.tileSize + r),
            t.pixels(r * t.w + c))
      }.toMap
    // oracle: per target pixel, inverse-project center, nearest source px
    var checked = 0
    for (ty <- 0 until dst.height; tx <- 0 until dst.width) {
      val gx = dst.originX + (tx % dst.tileSize + 0.5) * dst.pxW +
        (tx / dst.tileSize) * dst.tileSize * dst.pxW
      val gy = dst.originY + (ty % dst.tileSize + 0.5) * dst.pxH +
        (ty / dst.tileSize) * dst.tileSize * dst.pxH
      val (sx, sy) = Proj.reprojectPoint(gx, gy, 3857, 4326)
      val sc = math.floor((sx - src.originX) / src.pxW).toInt
      val sr = math.floor((sy - src.originY) / src.pxH).toInt
      val expected =
        if (sc >= 0 && sc < src.width && sr >= 0 && sr < src.height)
          Some(value(sc, sr, 0))
        else None
      expected match {
        case Some(v) =>
          // tile containing this target pixel must exist and match exactly
          got.get((tx, ty)) match {
            case Some(g) if g != dst.nodata =>
              assert(g === v, s"pixel ($tx,$ty)"); checked += 1
            case other => fail(s"pixel ($tx,$ty): expected $v got $other")
          }
        case None =>
          assert(!got.get((tx, ty)).exists(_ != dst.nodata), s"pixel ($tx,$ty) should be nodata")
      }
    }
    assert(checked > 1000, s"only $checked in-range pixels checked")
  }

  test("resample nearest then align is consistent with direct align") {
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, 128, 128, 32, 1)
    val tiles = TileOps.createRaster(spark, spec)((x, y, _) => (x + y).toDouble)
    val down = TileOps.resampleNearest(tiles, 2).collect()
    assert(down.forall(t => t.w == 16 && t.h == 16 && t.pxW == 0.5))
    val t0 = down.find(t => t.cellX == 0 && t.cellY == 0).get
    // target pixel (0,0) center falls in source pixel (1,1) -> v=2
    assert(t0.pixels(0) === 2.0)
  }
}
