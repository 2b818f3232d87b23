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

  test("warp composes reproject/align/clip with gdal.Warp argument semantics") {
    import graft.geo.{BBox, Polygon}
    val src = RasterSpec(0.0, 6800000.0, 1000.0, -1000.0, 128, 128, 64, 1,
      nodata = -9999.0, crs = 3857)
    def value(x: Int, y: Int, b: Int): Double = ((x * 7 + y * 13) % 97).toDouble
    val tiles = TileOps.createRaster(spark, src)(value)
    def asMap(ts: Array[Tile], tileSize: Int): Map[(Int, Int), Double] =
      ts.flatMap { t =>
        for (r <- 0 until t.h; c <- 0 until t.w)
          yield ((t.cellX * tileSize + c, t.cellY * tileSize + r), t.pixels(r * t.w + c))
      }.toMap

    // projection + extent + res + nodata in one call ≡ reproject onto the
    // same explicitly-built grid
    val extent = BBox(-0.125, 1.25, 51.5, 52.5)
    val (warped, dst) = TileOps2.warp(tiles, src, dstCrs = Some(4326),
      dstExtent = Some(extent), dstRes = Some((0.015625, 0.015625)),
      dstNodata = Some(-1.0))
    assert(dst.width == 88 && dst.height == 64 && dst.crs == 4326 && dst.nodata == -1.0)
    val composed = TileOps2.reproject(tiles, src, dst)
    assert(asMap(warped.collect(), dst.tileSize) == asMap(composed.collect(), dst.tileSize))

    // same-CRS warp ≡ align onto the derived grid (source res carried)
    val ext2 = BBox(32000.0, 96000.0, 6736000.0, 6768000.0)
    val (w2, dst2) = TileOps2.warp(tiles, src, dstExtent = Some(ext2))
    assert(dst2.crs == 3857 && dst2.pxW == 1000.0 && dst2.width == 64 && dst2.height == 32)
    assert(asMap(w2.collect(), dst2.tileSize) ==
      asMap(TileOps2.align(tiles, dst2).collect(), dst2.tileSize))

    // dst_width/dst_height derive the resolution (gdal width/height)
    val (_, dst3) = TileOps2.warp(tiles, src, dstExtent = Some(ext2),
      dstSize = Some((32, 16)))
    assert(dst3.pxW == 2000.0 && dst3.pxH == -2000.0 && dst3.width == 32 && dst3.height == 16)

    // targetAlignedPixels snaps the extent outward to res multiples
    val (_, dst4) = TileOps2.warp(tiles, src,
      dstExtent = Some(BBox(1500.0, 62500.0, 6740100.0, 6790300.0)),
      alignPixels = true)
    assert(dst4.originX == 1000.0 && dst4.originY == 6791000.0)
    assert(dst4.width == 62 && dst4.height == 51)

    // cutline: pixels with centers outside the clip polygon become nodata
    val clip = Polygon.box(BBox(40000.0, 56000.0, 6744000.0, 6760000.0))
    val (w5, dst5) = TileOps2.warp(tiles, src, dstExtent = Some(ext2),
      clipGeom = Some(clip))
    val m5 = asMap(w5.collect(), dst5.tileSize)
    assert(m5((2, 2)) == src.nodata) // center (34500, 6765500): outside cutline
    val inX = ((48000.0 - dst5.originX) / dst5.pxW).toInt
    val inY = ((6752000.0 - dst5.originY) / dst5.pxH).toInt
    assert(m5((inX, inY)) != src.nodata) // inside cutline

    // res and size are mutually exclusive, like gdal.Warp
    intercept[IllegalArgumentException] {
      TileOps2.warp(tiles, src, dstRes = Some((1.0, 1.0)), dstSize = Some((10, 10)))
    }
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
