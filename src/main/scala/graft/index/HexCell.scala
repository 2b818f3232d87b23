package graft.index

import graft.geo.{BBox, Polygon, Proj}

/** H3-style hexagonal cell index over the Web-Mercator plane.
  *
  * A pointy-top axial hex grid (standard public axial/cube-coordinate
  * construction) with aperture-4 resolution scaling: the hex size
  * (center-to-vertex) at resolution r is `BaseSize / 2^r` meters on the
  * EPSG:3857 plane. Cell ids pack `(res, q, r)` into one Long. This gives
  * the hexagonal k-ring adjacency the north rule's kNN join requires
  * (candidate rings of strictly increasing distance), with exact integer
  * cell arithmetic instead of H3's icosahedral projection — the cell
  * SHAPES differ from Uber H3, the k-ring/contains/cover semantics match.
  *
  * Reference analog: the sorted-by-distance candidate ring scan of
  * buteo/array/distance.py:70-132 (ring :109-114, early exit :122-128).
  *
  * Layout: bits 56..59 = res (0..15), bits 28..55 = q + 2^27,
  * bits 0..27 = r + 2^27.
  */
object HexCell {
  val MaxRes = 15
  val BaseSize: Double = math.pow(2, 22) // meters, center-to-vertex at res 0
  private val Bias = 1L << 27
  private val Sqrt3 = math.sqrt(3.0)

  def sizeAt(res: Int): Double = BaseSize / (1L << res).toDouble

  /** Axial coordinates (q, r) of the hex containing mercator point (x, y). */
  def mercatorToAxial(x: Double, y: Double, res: Int): (Long, Long) = {
    val s = sizeAt(res)
    val qf = (Sqrt3 / 3.0 * x - 1.0 / 3.0 * y) / s
    val rf = (2.0 / 3.0 * y) / s
    cubeRound(qf, rf)
  }

  /** Cube-coordinate rounding (public axial-hex algorithm). */
  def cubeRound(qf: Double, rf: Double): (Long, Long) = {
    val sf = -qf - rf
    var q = math.round(qf); var r = math.round(rf); val s = math.round(sf)
    val dq = math.abs(q - qf); val dr = math.abs(r - rf); val ds = math.abs(s - sf)
    if (dq > dr && dq > ds) q = -r - s
    else if (dr > ds) r = -q - s
    (q, r)
  }

  def pack(q: Long, r: Long, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res out of range: $res")
    (res.toLong << 56) | ((q + Bias) << 28) | (r + Bias)
  }

  def res(cell: Long): Int = ((cell >>> 56) & 0xf).toInt
  def q(cell: Long): Long = ((cell >>> 28) & 0x0fffffffL) - Bias
  def r(cell: Long): Long = (cell & 0x0fffffffL) - Bias

  def encode(lon: Double, lat: Double, res: Int): Long = {
    val (x, y) = Proj.lonLatToMercator(lon, lat)
    val (qq, rr) = mercatorToAxial(x, y, res)
    pack(qq, rr, res)
  }

  /** Mercator center of a cell. */
  def centerMercator(cell: Long): (Double, Double) = {
    val s = sizeAt(res(cell))
    val x = s * (Sqrt3 * q(cell) + Sqrt3 / 2.0 * r(cell))
    val y = s * (3.0 / 2.0 * r(cell))
    (x, y)
  }

  def centerLonLat(cell: Long): (Double, Double) = {
    val (x, y) = centerMercator(cell)
    Proj.mercatorToLonLat(x, y)
  }

  /** The 6 boundary vertices (lon, lat), pointy-top order starting at the
    * top vertex, counter-clockwise.
    */
  def boundaryLonLat(cell: Long): Array[(Double, Double)] = {
    val (cx, cy) = centerMercator(cell)
    val s = sizeAt(res(cell))
    (0 until 6).map { i =>
      val ang = math.Pi / 180.0 * (60.0 * i + 30.0)
      Proj.mercatorToLonLat(cx + s * math.cos(ang), cy + s * math.sin(ang))
    }.toArray
  }

  private val Dirs = Array((1L, 0L), (1L, -1L), (0L, -1L), (-1L, 0L), (-1L, 1L), (0L, 1L))

  def neighbors(cell: Long): Array[Long] = {
    val rs = res(cell); val cq = q(cell); val cr = r(cell)
    Dirs.map { case (dq, dr) => pack(cq + dq, cr + dr, rs) }
  }

  /** Hexes at hex-grid distance exactly `k` (standard ring walk). */
  def ring(cell: Long, k: Int): Array[Long] = {
    if (k == 0) return Array(cell)
    val rs = res(cell)
    var cq = q(cell) + Dirs(4)._1 * k
    var cr = r(cell) + Dirs(4)._2 * k
    val out = new Array[Long](6 * k)
    var idx = 0; var side = 0
    while (side < 6) {
      var step = 0
      while (step < k) {
        out(idx) = pack(cq, cr, rs); idx += 1
        cq += Dirs(side)._1; cr += Dirs(side)._2
        step += 1
      }
      side += 1
    }
    out
  }

  /** All hexes within grid distance `k` (1 + 3k(k+1) cells). */
  def kRing(cell: Long, k: Int): Array[Long] =
    (0 to k).flatMap(ring(cell, _)).toArray

  def gridDistance(a: Long, b: Long): Long = {
    require(res(a) == res(b), "cells must share a resolution")
    val dq = q(a) - q(b); val dr = r(a) - r(b)
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }

  /** Hex cells covering a lon/lat bbox at `res` — a superset of all cells
    * whose interior intersects the box (every point of the box maps to a
    * returned cell; cells are padded one ring to also catch edge overlap).
    */
  def cover(b: BBox, resolution: Int): Array[Long] = {
    val (x0, y0) = Proj.lonLatToMercator(b.xMin, b.yMin)
    val (x1, y1) = Proj.lonLatToMercator(b.xMax, b.yMax)
    val s = sizeAt(resolution)
    val set = new scala.collection.mutable.LinkedHashSet[Long]()
    // scan hex centers on a lattice fine enough to touch every hex in range,
    // then pad with neighbors for boundary overlap.
    val step = s * 0.85
    var y = y0 - s
    while (y <= y1 + s) {
      var x = x0 - s
      while (x <= x1 + s) {
        val (qq, rr) = mercatorToAxial(x, y, resolution)
        set += pack(qq, rr, resolution)
        x += step
      }
      y += step
    }
    set.flatMap(c => c +: neighbors(c).toSeq).toArray
  }

  /** Cover cells pruned to the POLYGON, not just its bbox (reference
    * analog: the R-tree prunes to geometry in buteo/vector/intersect.py:51).
    * Keep a bbox-cover cell iff its center lies inside the polygon or
    * within ~1.6 hex sizes of a polygon edge (conservative: the padding
    * exceeds the hex circumradius, so every intersecting cell survives —
    * property-tested in CellIndexSpec). Cuts the cover-cell count for
    * large polygons from O(bboxArea) to O(polygonArea + perimeter).
    */
  def polygonCover(p: Polygon, resolution: Int): Array[Long] = {
    val all = cover(p.bbox, resolution)
    val s = sizeAt(resolution)
    val pad = 1.6 * s
    // polygon rings projected to hex (mercator) space once
    val rings = p.rings.map { r =>
      val m = new Array[Double](r.length)
      var i = 0
      while (i < r.length) {
        val (mx, my) = Proj.lonLatToMercator(r(i), r(i + 1))
        m(i) = mx; m(i + 1) = my
        i += 2
      }
      m
    }
    def distToEdgesLe(cx: Double, cy: Double, lim: Double): Boolean = {
      val lim2 = lim * lim
      rings.exists { ring =>
        val n = ring.length / 2
        var i = 0
        var hit = false
        while (i < n && !hit) {
          val j = (i + 1) % n
          val ax = ring(2 * i); val ay = ring(2 * i + 1)
          val bx = ring(2 * j); val by = ring(2 * j + 1)
          val dx = bx - ax; val dy = by - ay
          val len2 = dx * dx + dy * dy
          val t = if (len2 == 0.0) 0.0
            else math.max(0.0, math.min(1.0, ((cx - ax) * dx + (cy - ay) * dy) / len2))
          val px = ax + t * dx - cx; val py = ay + t * dy - cy
          if (px * px + py * py <= lim2) hit = true
          i += 1
        }
        hit
      }
    }
    all.filter { c =>
      val (mx, my) = centerMercator(c)
      val (lon, lat) = Proj.mercatorToLonLat(mx, my)
      p.contains(lon, lat) || distToEdgesLe(mx, my, pad)
    }
  }
}
