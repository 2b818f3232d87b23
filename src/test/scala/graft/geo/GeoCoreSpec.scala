package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases ported from the reference's doctests/tests
  * (see /root/repo/FIXTURES.md §4; sources cited per case).
  */
class GeoCoreSpec extends AnyFunSuite {

  val gt = GeoTransform(0.0, 1.0, 0.0, 10.0, 0.0, -1.0)

  test("pixel offsets — buteo/bbox/operations.py:54-62") {
    assert(gt.pixelOffsets(BBox(2, 4, 4, 8)) === ((2, 2, 2, 4)))
  }

  test("bbox from geotransform — operations.py:129-136") {
    assert(gt.bbox(5, 5) === BBox(0, 5, 5, 10))
    assert(gt.bbox(100, 200) === BBox(0, 100, -190, 10))
    assert(gt.bbox(0, 0) === BBox(0, 0, 10, 10))
  }

  test("geotransform from bbox — operations.py:515-519") {
    assert(GeoTransform.fromBBox(BBox(0, 100, 50, 150), 100, 100) ===
      GeoTransform(0, 1, 0, 150, 0, -1))
    assert(GeoTransform.fromBBox(BBox(0, 100, 50, 150), 200, 50) ===
      GeoTransform(0, 0.5, 0, 150, 0, -2))
  }

  test("sub geotransform — operations.py:595-603") {
    val (sub, w, h) = gt.subGrid(BBox(2, 4, 4, 8))
    assert(sub === GeoTransform(2, 1, 0, 8, 0, -1))
    assert(w === 2 && h === 4)
  }

  test("align bbox to pixel grid — bbox/__init__.py:289-295 + operations.py:359-376") {
    val ref = BBox(0, 4, 0, 4)
    val target = BBox(1.2, 3.7, 1.2, 3.7)
    assert(BBox.alignToPixelSize(ref, target, 1.0, -1.0) === BBox(1, 4, 1, 4))
    assert(BBox.alignToPixelSize(ref, target, 0.5, -0.5) === BBox(1, 4, 1, 4))
  }

  test("union / intersection — operations.py:196-201,255-260") {
    assert(BBox(0, 2, 0, 2).intersection(BBox(1, 3, 1, 3)) === BBox(1, 2, 1, 2))
    assert(BBox(0, 1, 0, 1).intersection(BBox(1, 2, 1, 2)) === BBox(1, 1, 1, 1)) // corner touch
    assert(BBox(0, 1, 0, 1).union(BBox(1, 2, 1, 2)) === BBox(0, 2, 0, 2))
    assert(BBox(-10, 0, -10, 0).union(BBox(0, 10, 0, 10)) === BBox(-10, 10, -10, 10))
  }

  test("bbox intersect incl. dateline — validation.py:252-263") {
    assert(BBox(0, 1, 0, 1).intersects(BBox(0.5, 1.5, 0.5, 1.5)))
    assert(BBox(0, 1, 0, 1).intersects(BBox(1, 2, 0, 1))) // edge touch
    assert(BBox(170, -170, 0, 1).intersects(BBox(-175, -172, 0, 1))) // dateline overlap
    assert(!BBox(170, -170, 0, 1).intersects(BBox(160, 165, 0, 1))) // dateline no overlap
    assert(!BBox(0, 1, 0, 1).intersects(BBox(2, 3, 2, 3)))
  }

  test("contains point incl. dateline — bbox_class.py:486-489") {
    assert(BBox(170, -170, 0, 1).containsPoint(175, 0.5))
    assert(BBox(170, -170, 0, 1).containsPoint(-175, 0.5))
    assert(!BBox(170, -170, 0, 1).containsPoint(0, 0.5))
    assert(BBox(0, 1, 0, 1).containsPoint(0.5, 0.5))
    assert(!BBox(0, 1, 0, 1).containsPoint(1.5, 0.5))
  }

  test("utm epsg — utils_projection.py:808-811 + FIXTURES.md cases") {
    assert(Proj.utmEpsg(50.5, 8.5) === 32632)
    assert(Proj.utmEpsg(-10.0, 8.5) === 32732)
    assert(Proj.utmZone(-180.0) === 1)
    assert(Proj.utmZone(179.9) === 60)
  }

  test("web mercator round trip") {
    val pts = Seq((0.0, 0.0), (8.5, 50.5), (-122.4, 37.8), (179.0, -85.0))
    for ((lon, lat) <- pts) {
      val (x, y) = Proj.lonLatToMercator(lon, lat)
      val (lon2, lat2) = Proj.mercatorToLonLat(x, y)
      assert(math.abs(lon - lon2) < 1e-9 && math.abs(lat - lat2) < 1e-9)
    }
  }

  test("utm round trip + known value") {
    // EPSG:32632 for (lat 50.5, lon 8.5). Hand-derivation: central meridian
    // 9°, A = cos(50.5°)·(−0.5° rad) ≈ −0.0055510, N ≈ 6.3907e6,
    // easting ≈ 500000 + 0.9996·N·A ≈ 464540; northing ≈ k0·M(50.5°) ≈ 5.5944e6.
    val (e, n) = Proj.lonLatToUtm(8.5, 50.5, 32, south = false)
    assert(math.abs(e - 464540.0) < 10.0, s"easting $e")
    assert(n > 5590000.0 && n < 5600000.0, s"northing $n")
    val (lon2, lat2) = Proj.utmToLonLat(e, n, 32, south = false)
    assert(math.abs(lon2 - 8.5) < 1e-6 && math.abs(lat2 - 50.5) < 1e-6)
  }

  test("reproject point routes 4326<->3857<->utm") {
    val (x, y) = Proj.reprojectPoint(8.5, 50.5, 4326, 3857)
    val (lon, lat) = Proj.reprojectPoint(x, y, 3857, 4326)
    assert(math.abs(lon - 8.5) < 1e-9 && math.abs(lat - 50.5) < 1e-9)
    val (e, n) = Proj.reprojectPoint(8.5, 50.5, 4326, 32632)
    val (lon2, lat2) = Proj.reprojectPoint(e, n, 32632, 4326)
    assert(math.abs(lon2 - 8.5) < 1e-6 && math.abs(lat2 - 50.5) < 1e-6)
  }

  test("winding PIP: square, concave, hole") {
    val square = Polygon.box(BBox(0, 10, 0, 10))
    assert(square.contains(5, 5))
    assert(square.contains(0, 0)) // boundary counts as inside
    assert(!square.contains(11, 5))
    // concave "C": outer box minus a right notch
    val c = Polygon(Array(Array(0, 0, 10, 0, 10, 3, 3, 3, 3, 7, 10, 7, 10, 10, 0, 10)))
    assert(c.contains(1, 5))
    assert(!c.contains(8, 5)) // inside the notch
    assert(c.contains(8, 1))
    // donut
    val donut = Polygon(Array(
      Array(0, 0, 10, 0, 10, 10, 0, 10),
      Array(3, 3, 7, 3, 7, 7, 3, 7)))
    assert(donut.contains(1, 1))
    assert(!donut.contains(5, 5))
  }

  test("r-tree query matches brute force") {
    val rnd = new scala.util.Random(42)
    val boxes = Array.fill(500) {
      val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
      BBox(x, x + rnd.nextDouble() * 5, y, y + rnd.nextDouble() * 5)
    }
    val tree = RTree.build(boxes)
    for (_ <- 1 to 50) {
      val qx = rnd.nextDouble() * 100; val qy = rnd.nextDouble() * 100
      val q = BBox(qx, qx + 10, qy, qy + 10)
      val expect = boxes.indices.filter(i => boxes(i).intersects(q)).toSet
      val got = tree.query(q.xMin, q.xMax, q.yMin, q.yMax).toSet
      assert(got === expect)
    }
  }

  test("GeoJSON emit/parse round-trips polygons with holes") {
    val p = Polygon(Array(
      Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0),
      Array(2.0, 2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 2.0)))
    val gj = Wkt.toGeoJson(p)
    assert(gj.startsWith("""{"type":"Polygon","coordinates":["""))
    val back = Wkt.fromGeoJson(gj)
    assert(back.rings.length == 2)
    // emitted rings are closed (first point repeated); geometry equal
    assert(back.rings(0).take(8).toSeq == p.rings(0).toSeq)
    assert(back.rings(1).take(8).toSeq == p.rings(1).toSeq)
    assert(Wkt.area(back) == Wkt.area(p))
    // and WKT of the parse matches the WKT of the source
    assert(Wkt.toWkt(back) == Wkt.toWkt(p) ||
      Wkt.area(Wkt.parsePolygon(Wkt.toWkt(back))) == Wkt.area(p))
  }
}
