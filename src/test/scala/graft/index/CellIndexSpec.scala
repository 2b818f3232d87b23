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

  test("bbox segment intersection: pass-through, touch, and miss") {
    val b = BBox(0.0, 10.0, 0.0, 10.0)
    assert(b.intersectsSegment(-5, 5, 15, 5))   // through, endpoints outside
    assert(b.intersectsSegment(2, 2, 8, 8))     // fully inside
    assert(b.intersectsSegment(-5, -5, 0, 0))   // corner touch
    assert(b.intersectsSegment(-5, 10, 15, 10)) // edge run along the top
    assert(!b.intersectsSegment(-5, 11, 15, 11))
    assert(!b.intersectsSegment(11, -5, 11, 15))
    assert(!b.intersectsSegment(-5, -5, -1, 4)) // diagonal miss near corner
  }

  test("classifyBox: inside / outside / crossing / hole cases") {
    // square with a square hole
    val p = Polygon(Array(
      Array(0.0, 0.0, 40.0, 0.0, 40.0, 40.0, 0.0, 40.0),
      Array(10.0, 10.0, 30.0, 10.0, 30.0, 30.0, 10.0, 30.0)))
    assert(p.classifyBox(BBox(2, 8, 2, 8)) === 1)      // in the solid rim
    assert(p.classifyBox(BBox(50, 60, 50, 60)) === 0)  // outside
    assert(p.classifyBox(BBox(15, 25, 15, 25)) === 0)  // wholly inside hole
    assert(p.classifyBox(BBox(-5, 5, -5, 5)) === 2)    // crosses outer ring
    assert(p.classifyBox(BBox(8, 12, 8, 12)) === 2)    // crosses hole ring
    assert(p.classifyBox(BBox(-10, 50, -10, 50)) === 2) // contains the polygon
  }

  test("compactCells merges complete quads recursively") {
    val root = GridCell.encode(8.5, 50.5, 3)
    val grandkids = GridCell.children(root).flatMap(GridCell.children)
    assert(GridCell.compactCells(grandkids).toSeq === Seq(root))
    // 15 of 16 grandchildren: the missing one's siblings stay, the other
    // three child quads merge
    val partial = grandkids.drop(1)
    val got = GridCell.compactCells(partial)
    assert(got.length === 3 + 3)
    assert(GridCell.compactCells(got ++ Array(grandkids(0))).toSeq === Seq(root))
  }

  test("adaptiveCover: superset of the polygon, within budget, deterministic") {
    // concave L-shape
    val p = Polygon(Array(Array(
      -10.0, 10.0, 30.0, 10.0, 30.0, 25.0, 10.0, 25.0, 10.0, 55.0, -10.0, 55.0)))
    val budget = 64
    val cover = GridCell.adaptiveCover(p, budget, maxLevel = 12)
    assert(cover.nonEmpty && cover.length <= budget)
    assert(cover.toSeq === GridCell.adaptiveCover(p, budget, maxLevel = 12).toSeq)
    // mixed levels: a budgeted refinement of a concave shape can't stay flat
    assert(cover.map(GridCell.level).distinct.length > 1)
    // prefix-free and quad-minimal
    val set = cover.toSet
    cover.foreach { c =>
      var a = c
      while (GridCell.level(a) > 0) { a = GridCell.parent(a); assert(!set(a)) }
    }
    assert(cover.filter(GridCell.level(_) > 0).groupBy(GridCell.parent)
      .values.forall(_.length < 4))
    // covering: every sampled interior point lands in some cover cell
    val rnd = new scala.util.Random(11)
    var checked = 0
    while (checked < 500) {
      val x = rnd.nextDouble() * 50 - 15
      val y = rnd.nextDouble() * 55 + 5
      if (p.contains(x, y)) {
        assert(cover.exists(c => GridCell.cellBBox(c).containsPoint(x, y)),
          s"uncovered interior point ($x, $y)")
        checked += 1
      }
    }
  }

  test("adaptiveCover: degenerate budgets and disjoint polygons") {
    val p = Polygon.box(BBox(1.0, 2.0, 48.0, 49.0))
    // budget 1: no split fits, the root covers everything
    assert(GridCell.adaptiveCover(p, 1).toSeq === Seq(GridCell.pack(0, 0, 0)))
    // tighter budget -> never more cells than a looser one
    val small = GridCell.adaptiveCover(p, 8, maxLevel = 10)
    val big = GridCell.adaptiveCover(p, 256, maxLevel = 10)
    assert(small.length <= 8 && big.length <= 256)
    assert(small.nonEmpty && big.length >= small.length)
  }

  test("grid cell: ancestor shift of a fine cell equals direct encode at every level") {
    // the geo_pyramid identity: because (lon+180)/360 is computed once and
    // multiplied by powers of two, floor at level L == floor at level 8
    // shifted right — so one fine cell generates the whole pyramid by bit ops
    for (_ <- 1 to 500) {
      val lon = randLon(); val lat = randLat()
      val c8 = GridCell.encode(lon, lat, 8)
      for (l <- 0 to 8) {
        val shifted = GridCell.pack(
          GridCell.x(c8) >> (8 - l), GridCell.y(c8) >> (8 - l), l)
        assert(shifted === GridCell.encode(lon, lat, l), s"level $l lon=$lon lat=$lat")
      }
    }
  }
}
