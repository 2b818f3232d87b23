package graft.index

import graft.geo.{BBox, Polygon, Proj}
import org.scalatest.funsuite.AnyFunSuite

class CellIndexSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4242)
  private def randLon(): Double = rnd.nextDouble() * 359.998 - 179.999
  private def randLat(): Double = rnd.nextDouble() * 169.8 - 84.9

  test("grid cell: encode/decode round trip (property)") {
    for (_ <- 1 to 500) {
      val lon = randLon(); val lat = randLat(); val lvl = rnd.nextInt(21)
      val c = GridCell.encode(lon, lat, lvl)
      assert(GridCell.level(c) === lvl)
      assert(GridCell.cellBBox(c).containsPoint(lon, lat))
    }
  }

  test("grid cell: resolution nesting (child within parent)") {
    for (_ <- 1 to 300) {
      val lon = randLon(); val lat = randLat(); val lvl = 1 + rnd.nextInt(20)
      val c = GridCell.encode(lon, lat, lvl)
      val p = GridCell.parent(c)
      assert(GridCell.cellBBox(c).within(GridCell.cellBBox(p)))
      assert(GridCell.children(p).contains(c))
    }
  }

  test("grid cell: ring sizes and disjointness") {
    val c = GridCell.encode(8.5, 50.5, 10)
    assert(GridCell.ring(c, 0) === Array(c))
    assert(GridCell.ring(c, 1).length === 8)
    assert(GridCell.ring(c, 2).length === 16)
    assert(GridCell.ring(c, 1).intersect(GridCell.ring(c, 2)).isEmpty)
    assert(GridCell.kRing(c, 2).length === 25)
  }

  test("grid cell: ring wraps at dateline, clamps at poles") {
    val cDate = GridCell.encode(179.99, 0.0, 8)
    assert(GridCell.ring(cDate, 1).length === 8) // wrapped, none dropped
    val cPole = GridCell.encode(0.0, 89.99, 8)
    assert(GridCell.ring(cPole, 1).length === 5) // top row clamped away
  }

  test("grid cell: cover contains encoding cell of every inner point") {
    val b = BBox(8.0, 9.0, 50.0, 51.0)
    val cells = GridCell.cover(b, 8).toSet
    for (_ <- 1 to 200) {
      val lon = 8.0 + rnd.nextDouble(); val lat = 50.0 + rnd.nextDouble()
      assert(cells.contains(GridCell.encode(lon, lat, 8)))
    }
  }

  test("hex cell: encode/decode center is in same cell (property)") {
    for (_ <- 1 to 500) {
      val lon = randLon(); val lat = randLat(); val res = rnd.nextInt(13)
      val c = HexCell.encode(lon, lat, res)
      val (clon, clat) = HexCell.centerLonLat(c)
      assert(HexCell.encode(clon, clat, res) === c)
    }
  }

  test("hex cell: point is nearest to its cell center (hex voronoi property)") {
    for (_ <- 1 to 200) {
      val lon = rnd.nextDouble() * 300 - 150
      val lat = rnd.nextDouble() * 140 - 70
      val res = 6
      val c = HexCell.encode(lon, lat, res)
      val (px, py) = Proj.lonLatToMercator(lon, lat)
      val (cx, cy) = HexCell.centerMercator(c)
      val dSelf = math.hypot(px - cx, py - cy)
      for (nb <- HexCell.neighbors(c)) {
        val (nx, ny) = HexCell.centerMercator(nb)
        val dN = math.hypot(px - nx, py - ny)
        assert(dN >= dSelf - 1e-6, s"point ($lon,$lat) closer to neighbor")
      }
    }
  }

  test("hex cell: ring sizes 6k, kRing 1+3k(k+1), distances correct") {
    val c = HexCell.encode(8.5, 50.5, 7)
    assert(HexCell.ring(c, 0) === Array(c))
    for (k <- 1 to 4) {
      val ring = HexCell.ring(c, k)
      assert(ring.length === 6 * k)
      assert(ring.forall(HexCell.gridDistance(c, _) == k))
    }
    assert(HexCell.kRing(c, 3).length === 1 + 3 * 3 * 4)
    assert(HexCell.kRing(c, 3).distinct.length === HexCell.kRing(c, 3).length)
  }

  test("hex cell: neighbors are symmetric (property)") {
    for (_ <- 1 to 200) {
      val c = HexCell.encode(randLon(), randLat(), 7)
      for (nb <- HexCell.neighbors(c))
        assert(HexCell.neighbors(nb).contains(c))
    }
  }

  test("hex cell: cover contains encoding cell of every inner point") {
    val b = BBox(8.0, 9.5, 50.0, 51.0)
    val cells = HexCell.cover(b, 7).toSet
    for (_ <- 1 to 300) {
      val lon = 8.0 + rnd.nextDouble() * 1.5; val lat = 50.0 + rnd.nextDouble()
      assert(cells.contains(HexCell.encode(lon, lat, 7)), s"missing cell for ($lon,$lat)")
    }
    val poly = Polygon.box(b)
    val pc = HexCell.polygonCover(poly, 7).toSet
    assert(pc.subsetOf(cells))
    for (_ <- 1 to 300) {
      val lon = 8.0 + rnd.nextDouble() * 1.5; val lat = 50.0 + rnd.nextDouble()
      assert(pc.contains(HexCell.encode(lon, lat, 7)))
    }
  }

  test("hex cell: polygonCover prunes to the geometry but still covers it") {
    // tall L: bbox is 4°×4° but the polygon occupies ~40% of it
    val l = Polygon(Array(Array(
      8.0, 50.0, 12.0, 50.0, 12.0, 51.0, 9.0, 51.0, 9.0, 54.0, 8.0, 54.0)))
    val bboxCover = HexCell.cover(l.bbox, 7).toSet
    val pc = HexCell.polygonCover(l, 7).toSet
    assert(pc.subsetOf(bboxCover))
    assert(pc.size < bboxCover.size, s"no pruning: ${pc.size} vs ${bboxCover.size}")
    // every point of the polygon still maps into the pruned cover
    for (_ <- 1 to 500) {
      val lon = 8.0 + rnd.nextDouble() * 4.0
      val lat = 50.0 + rnd.nextDouble() * 4.0
      if (l.contains(lon, lat))
        assert(pc.contains(HexCell.encode(lon, lat, 7)), s"missing ($lon,$lat)")
    }
  }

  test("s2 cell: cover density scales with level (fine levels not under-covered)") {
    val b = BBox(8.0, 10.0, 50.0, 52.0)
    val cells = S2Cell.cover(b, 12).toSet
    for (_ <- 1 to 300) {
      val lon = 8.2 + rnd.nextDouble() * 1.6; val lat = 50.2 + rnd.nextDouble() * 1.6
      assert(cells.contains(S2Cell.encode(lon, lat, 12)), s"missing ($lon,$lat)")
    }
  }

  test("s2 cell: encode/decode round trip via center (property)") {
    for (_ <- 1 to 500) {
      val lon = randLon(); val lat = randLat(); val lvl = rnd.nextInt(20)
      val c = S2Cell.encode(lon, lat, lvl)
      assert(S2Cell.level(c) === lvl)
      assert(S2Cell.contains(c, lon, lat))
      val (clon, clat) = S2Cell.centerLonLat(c)
      assert(S2Cell.encode(clon, clat, lvl) === c, s"center re-encode at ($lon,$lat,$lvl)")
    }
  }

  test("s2 cell: resolution nesting (child of parent)") {
    for (_ <- 1 to 300) {
      val lon = randLon(); val lat = randLat(); val lvl = 1 + rnd.nextInt(19)
      val c = S2Cell.encode(lon, lat, lvl)
      val p = S2Cell.parent(c)
      assert(S2Cell.children(p).contains(c))
      assert(S2Cell.encode(lon, lat, lvl - 1) === p)
    }
  }

  test("s2 cell: six faces partition the sphere (sampled)") {
    val faces = scala.collection.mutable.Set[Int]()
    for (_ <- 1 to 2000) {
      val c = S2Cell.encode(randLon(), randLat(), 10)
      faces += S2Cell.face(c)
      assert(S2Cell.face(c) >= 0 && S2Cell.face(c) <= 5)
    }
    assert(faces.size >= 5) // poles are rare in the lat range; 5-6 faces seen
  }

  test("s2 cell: cover contains encoding cell of inner points") {
    val b = graft.geo.BBox(8.0, 9.5, 50.0, 51.0)
    val cells = S2Cell.cover(b, 10).toSet
    for (_ <- 1 to 200) {
      val lon = 8.0 + rnd.nextDouble() * 1.5; val lat = 50.0 + rnd.nextDouble()
      assert(cells.contains(S2Cell.encode(lon, lat, 10)), s"missing ($lon,$lat)")
    }
  }

  test("s2 cell: cross-face neighbors are symmetric (property)") {
    val rnd = new scala.util.Random(7)
    val lvl = 4
    (1 to 300).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 170 - 85
      val c = S2Cell.encode(lon, lat, lvl)
      S2Cell.neighbors(c).foreach { nb =>
        assert(S2Cell.level(nb) === lvl)
        assert(S2Cell.neighbors(nb).contains(c),
          s"neighbor not symmetric: c=$c f=${S2Cell.face(c)} " +
            s"(${S2Cell.i(c)},${S2Cell.j(c)}) nb=$nb f=${S2Cell.face(nb)} " +
            s"(${S2Cell.i(nb)},${S2Cell.j(nb)})")
      }
    }
  }

  test("s2 cell: edge cells get neighbors on the adjacent face") {
    val lvl = 3
    val n = 1L << lvl
    // walk every edge row of every face; each must produce at least one
    // off-face neighbor, and every neighbor center must re-encode to
    // itself (the wrap lands on a real cell)
    (0 until 6).foreach { f =>
      (0L until n).foreach { k =>
        Seq((k, 0L), (k, n - 1), (0L, k), (n - 1, k)).foreach { case (ii, jj) =>
          val c = S2Cell.pack(f, ii, jj, lvl)
          val nbs = S2Cell.neighbors(c)
          assert(nbs.exists(nb => S2Cell.face(nb) != f), s"no cross-face nb at f=$f i=$ii j=$jj")
          nbs.foreach { nb =>
            val (lo, la) = S2Cell.centerLonLat(nb)
            assert(S2Cell.encode(lo, la, lvl) === nb)
          }
        }
      }
    }
  }

  test("s2 cell: interior kRing matches Chebyshev disk; cross-face kRing wraps") {
    // interior cell: kRing(1) = 9 cells, kRing(2) = 25
    val c = S2Cell.pack(0, 8, 8, 4)
    assert(S2Cell.kRing(c, 0).toSeq === Seq(c))
    assert(S2Cell.kRing(c, 1).length === 9)
    assert(S2Cell.kRing(c, 2).length === 25)
    // corner cell of a face: 8-neighborhood drops the off-corner diagonal
    // but wraps the two edges, so the ring still has ≥ 7 distinct cells
    val corner = S2Cell.pack(0, 0, 0, 4)
    val ring = S2Cell.kRing(corner, 1)
    assert(ring.length >= 7 && ring.contains(corner))
    assert(ring.exists(nb => S2Cell.face(nb) != 0))
  }

  test("hex cell: boundary vertices surround the center") {
    val c = HexCell.encode(8.5, 50.5, 7)
    val verts = HexCell.boundaryLonLat(c)
    assert(verts.length === 6)
    val (clon, clat) = HexCell.centerLonLat(c)
    val lonOk = verts.exists(_._1 < clon) && verts.exists(_._1 > clon)
    val latOk = verts.exists(_._2 < clat) && verts.exists(_._2 > clat)
    assert(lonOk && latOk)
  }

  test("s2 parentN: rollup equals direct encoding at the coarser level (property)") {
    val rnd = new scala.util.Random(20260817L)
    for (_ <- 1 to 2000) {
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 180.0 - 90.0
      val l = 2 + rnd.nextInt(18)
      val s = rnd.nextInt(l + 1)
      assert(S2Cell.parentN(S2Cell.encode(lon, lat, l), s) ===
        S2Cell.encode(lon, lat, l - s), s"($lon,$lat) l=$l s=$s")
    }
  }

  test("s2 parentN: steps=0 is identity, full depth lands on the face cell, children invert") {
    val c = S2Cell.encode(12.34, 56.78, 9)
    assert(S2Cell.parentN(c, 0) === c)
    assert(S2Cell.level(S2Cell.parentN(c, 9)) === 0)
    assert(S2Cell.parentN(c, 2) === S2Cell.parent(S2Cell.parent(c)))
    S2Cell.children(c).foreach(ch => assert(S2Cell.parentN(ch, 1) === c))
    assertThrows[IllegalArgumentException](S2Cell.parentN(c, 10))
  }
}
