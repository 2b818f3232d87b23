package graft.index

import graft.geo.{BBox, Polygon}

/** Global equirectangular quadtree cell index (Z-order / Morton encoded).
  *
  * Level `L` splits lon [-180,180) into 2^L columns and lat [-90,90) into
  * 2^L rows; a cell id packs `(level, morton(x,y))` into one Long. This is
  * the engine's exact, SQL-expressible tiling index — the analog of the
  * reference's grid-cell tiling (reference: buteo/raster/grid.py:35-232) —
  * and the secondary (quadtree) index named by the north rule next to the
  * hex index in [[HexCell]].
  *
  * Layout: bits 58..62 = level (0..28), bits 0..57 = morton(x, y)
  * (x in even bit positions, y in odd).
  */
object GridCell {
  val MaxLevel = 28

  /** Column index at `level` for a longitude (clamped into range). */
  def lonToX(lon: Double, level: Int): Long = {
    val n = 1L << level
    val x = math.floor((lon + 180.0) / 360.0 * n).toLong
    math.min(math.max(x, 0L), n - 1)
  }

  /** Row index at `level` for a latitude (clamped into range). */
  def latToY(lat: Double, level: Int): Long = {
    val n = 1L << level
    val y = math.floor((lat + 90.0) / 180.0 * n).toLong
    math.min(math.max(y, 0L), n - 1)
  }

  def encode(lon: Double, lat: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level out of range: $level")
    pack(lonToX(lon, level), latToY(lat, level), level)
  }

  def pack(x: Long, y: Long, level: Int): Long =
    (level.toLong << 58) | interleave(x) | (interleave(y) << 1)

  def level(cell: Long): Int = ((cell >>> 58) & 0x1f).toInt
  def x(cell: Long): Long = deinterleave(cell & 0x03ffffffffffffffL)
  def y(cell: Long): Long = deinterleave((cell & 0x03ffffffffffffffL) >>> 1)

  def parent(cell: Long): Long = {
    val l = level(cell)
    require(l > 0, "root cell has no parent")
    pack(x(cell) >> 1, y(cell) >> 1, l - 1)
  }

  def children(cell: Long): Array[Long] = {
    val l = level(cell); val cx = x(cell) << 1; val cy = y(cell) << 1
    Array(pack(cx, cy, l + 1), pack(cx + 1, cy, l + 1),
          pack(cx, cy + 1, l + 1), pack(cx + 1, cy + 1, l + 1))
  }

  /** Geographic extent of a cell. */
  def cellBBox(cell: Long): BBox = {
    val l = level(cell); val n = (1L << l).toDouble
    val cx = x(cell); val cy = y(cell)
    BBox(cx / n * 360.0 - 180.0, (cx + 1) / n * 360.0 - 180.0,
         cy / n * 180.0 - 90.0, (cy + 1) / n * 180.0 - 90.0)
  }

  /** The ring of cells at Chebyshev distance exactly `k` (longitude wraps,
    * latitude clamps). k=0 yields the cell itself.
    */
  def ring(cell: Long, k: Int): Array[Long] = {
    val l = level(cell); val n = 1L << l
    val cx = x(cell); val cy = y(cell)
    if (k == 0) return Array(cell)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        if (math.max(math.abs(dx), math.abs(dy)) == k) {
          val yy = cy + dy
          if (yy >= 0 && yy < n) {
            val xx = ((cx + dx) % n + n) % n
            out += pack(xx, yy, l)
          }
        }
        dy += 1
      }
      dx += 1
    }
    out.distinct.toArray
  }

  /** All cells within Chebyshev distance `k` (the k-disk). */
  def kRing(cell: Long, k: Int): Array[Long] =
    (0 to k).flatMap(ring(cell, _)).toArray

  /** Cells covering a bbox at `level` (a superset of intersecting cells;
    * no dateline split — callers pass non-crossing boxes).
    */
  def cover(b: BBox, level: Int): Array[Long] = {
    val x0 = lonToX(b.xMin, level); val x1 = lonToX(b.xMax, level)
    val y0 = latToY(b.yMin, level); val y1 = latToY(b.yMax, level)
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0; var cx = x0
    while (cx <= x1) {
      var cy = y0
      while (cy <= y1) { out(i) = pack(cx, cy, level); i += 1; cy += 1 }
      cx += 1
    }
    out
  }

  /** Cells covering a polygon at `level`: bbox cover pruned to cells whose
    * extent intersects the polygon's bbox. Always a superset of the cells
    * containing any interior point (join cover is refined by exact PIP).
    */
  def polygonCover(p: Polygon, level: Int): Array[Long] =
    cover(p.bbox, level)

  /** Budgeted mixed-level polygon covering — the S2 RegionCoverer recipe
    * on the quadtree: starting from the root, boundary-CROSSING cells are
    * refined breadth-first (biggest first, cell id tie-break — fully
    * deterministic) while the covering fits `maxCells`; cells whose
    * extent classifies fully INSIDE are final immediately, DISJOINT
    * children are dropped, and the surviving frontier is normalized by
    * [[compactCells]]. The result is always a superset of the polygon
    * (every interior point lies in some cell), so it is safe as the
    * broadcast cell prefilter of a PIP join: a few hundred mixed-level
    * cells bound a region that a fixed-level cover would either blanket
    * coarsely or explode into millions of fine tiles.
    */
  def adaptiveCover(p: Polygon, maxCells: Int, maxLevel: Int = MaxLevel): Array[Long] = {
    require(maxCells >= 1, s"adaptiveCover: maxCells must be >= 1, got $maxCells")
    require(maxLevel >= 0 && maxLevel <= MaxLevel,
      s"adaptiveCover: maxLevel out of range: $maxLevel")
    val root = pack(0, 0, 0)
    p.classifyBox(cellBBox(root)) match {
      case 0 => return Array.empty
      case 1 => return Array(root)
      case _ =>
    }
    val inside = collection.mutable.ArrayBuffer[Long]()
    val frontier = collection.mutable.TreeSet[(Int, Long)]((0, root))
    var total = 1
    var more = true
    while (more) {
      // biggest splittable frontier cell, if the worst-case growth fits
      frontier.find { case (l, _) => l < maxLevel } match {
        case Some(e @ (l, c)) if total + 3 <= maxCells =>
          frontier -= e
          total -= 1
          children(c).foreach { ch =>
            p.classifyBox(cellBBox(ch)) match {
              case 0 =>
              case 1 => inside += ch; total += 1
              case _ => frontier += ((l + 1, ch)); total += 1
            }
          }
        case _ => more = false
      }
    }
    compactCells(inside.toArray ++ frontier.iterator.map(_._2))
  }

  /** Merge every complete sibling quadruple bottom-up (mixed-level,
    * prefix-free input): the minimal cell set with the same union —
    * the driver-side twin of graft.ops.CellSets.compact, sized for the
    * bounded covers adaptiveCover emits. Output sorted for determinism.
    */
  def compactCells(cells: Array[Long]): Array[Long] = {
    val set = collection.mutable.HashSet.empty[Long]
    cells.foreach(set += _)
    var changed = true
    while (changed) {
      changed = false
      set.toArray.foreach { c =>
        if (set.contains(c) && level(c) > 0) {
          val sib = children(parent(c))
          if (sib.forall(set.contains)) {
            sib.foreach(set -= _)
            set += parent(c)
            changed = true
          }
        }
      }
    }
    set.toArray.sorted
  }

  private def interleave(v: Long): Long = {
    var x = v & 0x1fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def deinterleave(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }
}
