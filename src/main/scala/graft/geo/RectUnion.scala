package graft.geo

/** Exact geometric union of RECTILINEAR polygons (all edges axis-aligned)
  * — the per-group kernel behind vector dissolve's ST_Union semantics
  * (reference: buteo/vector/dissolve.py:101-116 delegates to SQLite
  * ST_Union; our v1 supports the rectilinear class exactly, general
  * polygons staged).
  *
  * Algorithm: grid decomposition over the vertex lattice. Cells of the
  * lattice are entirely inside or outside every input polygon, so a
  * single center PIP test per (cell, polygon) classifies coverage
  * exactly; the union boundary is then traced from covered/uncovered
  * cell edges (marching-squares-style with deterministic corner
  * resolution) and collinear runs are merged into minimal rings.
  * Outer rings come out CCW (positive shoelace), holes CW, so the
  * shoelace sum of all rings IS the union area — returning the area from
  * the assembled rings makes any tracing bug visible to the area oracle.
  */
object RectUnion {

  final case class Union(area: Double, rings: Seq[Array[Double]]) {
    def nRings: Int = rings.size
    def nVertices: Int = rings.map(_.length / 2).sum
  }

  def union(polys: Seq[Polygon]): Union = {
    require(polys.nonEmpty, "union of zero polygons")
    run(polys, (x, y) => polys.exists(_.contains(x, y)))
  }

  /** Generic rectilinear boolean overlay: cell is in the result iff
    * `keep(inA, inB)` — Intersection = `_ && _`, Difference = `_ && !_`,
    * Union = `_ || _`, Xor = `_ != _`. Same exact grid-decomposition
    * kernel as `union` (reference: buteo/vector/clip.py:1-260 reaches
    * polygon clipping through GDAL/GEOS; this is the from-scratch exact
    * kernel for the rectilinear class).
    */
  def overlay(a: Seq[Polygon], b: Seq[Polygon],
              keep: (Boolean, Boolean) => Boolean): Union = {
    if (a.isEmpty && b.isEmpty) return Union(0.0, Seq.empty)
    run(a ++ b, (x, y) =>
      keep(a.exists(_.contains(x, y)), b.exists(_.contains(x, y))))
  }

  /** Grid decomposition over the vertex lattice of `latticePolys`; cell
    * coverage decided by `inside` sampled at the cell center (exact for
    * rectilinear inputs: no edge crosses a lattice cell).
    */
  private def run(latticePolys: Seq[Polygon],
                  inside: (Double, Double) => Boolean): Union = {
    val polys = latticePolys
    val xs = polys.flatMap(_.rings.flatMap(r => (0 until r.length by 2).map(r(_))))
      .distinct.sorted.toArray
    val ys = polys.flatMap(_.rings.flatMap(r => (1 until r.length by 2).map(r(_))))
      .distinct.sorted.toArray
    val nx = xs.length - 1; val ny = ys.length - 1
    if (nx <= 0 || ny <= 0) return Union(0.0, Seq.empty)

    val covered = Array.ofDim[Boolean](nx, ny)
    var i = 0
    while (i < nx) {
      var j = 0
      while (j < ny) {
        val cx = (xs(i) + xs(i + 1)) / 2.0
        val cy = (ys(j) + ys(j + 1)) / 2.0
        covered(i)(j) = inside(cx, cy)
        j += 1
      }
      i += 1
    }

    var area = 0.0
    i = 0
    while (i < nx) {
      var j = 0
      while (j < ny) {
        if (covered(i)(j)) area += (xs(i + 1) - xs(i)) * (ys(j + 1) - ys(j))
        j += 1
      }
      i += 1
    }

    def cov(ci: Int, cj: Int): Boolean =
      ci >= 0 && ci < nx && cj >= 0 && cj < ny && covered(ci)(cj)

    // directed boundary edges in lattice-vertex index space, interior on
    // the LEFT: bottom edge → +x, top → −x, left → −y, right → +y
    // edge key: (vertexIndex, direction); vertexIndex = vi * (ny+2) ... use (vi, vj, dir)
    final case class E(vi: Int, vj: Int, dir: Int) // dir 0=+x 1=-x 2=+y 3=-y
    val edges = collection.mutable.LinkedHashSet.empty[E]
    i = 0
    while (i < nx) {
      var j = 0
      while (j < ny) {
        if (covered(i)(j)) {
          if (!cov(i, j - 1)) edges += E(i, j, 0)          // bottom: (i,j)→(i+1,j)
          if (!cov(i, j + 1)) edges += E(i + 1, j + 1, 1)  // top: (i+1,j+1)→(i,j+1)
          if (!cov(i - 1, j)) edges += E(i, j + 1, 3)      // left: (i,j+1)→(i,j)
          if (!cov(i + 1, j)) edges += E(i + 1, j, 2)      // right: (i+1,j)→(i+1,j+1)
        }
        j += 1
      }
      i += 1
    }

    // index outgoing edges by start vertex
    val out = collection.mutable.HashMap.empty[(Int, Int), List[E]]
    edges.foreach { e =>
      val k = (e.vi, e.vj)
      out(k) = e :: out.getOrElse(k, Nil)
    }
    def endOf(e: E): (Int, Int) = e.dir match {
      case 0 => (e.vi + 1, e.vj)
      case 1 => (e.vi - 1, e.vj)
      case 2 => (e.vi, e.vj + 1)
      case 3 => (e.vi, e.vj - 1)
    }
    // deterministic corner resolution: prefer the sharpest LEFT turn
    // relative to the incoming direction — with interior-on-left tracing
    // this hugs the current region, so diagonally corner-touching regions
    // stay separate rings. turn preference: left, straight, right, back
    val rightOf = Array(3, 2, 0, 1) // dir → right turn
    val leftOf = Array(2, 3, 1, 0)
    val backOf = Array(1, 0, 3, 2)

    val rings = collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = collection.mutable.LinkedHashSet.empty[E]
    edges.foreach(remaining += _)
    while (remaining.nonEmpty) {
      val start = remaining.head
      val verts = collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var cur = start
      var done = false
      while (!done) {
        remaining -= cur
        val k = (cur.vi, cur.vj)
        out(k) = out(k).filterNot(_ == cur)
        verts += k
        val nk = endOf(cur)
        if (nk == (start.vi, start.vj)) done = true
        else {
          val cands = out.getOrElse(nk, Nil)
          val pref = Seq(leftOf(cur.dir), cur.dir, rightOf(cur.dir), backOf(cur.dir))
          cur = pref.iterator.flatMap(d => cands.find(_.dir == d)).next()
        }
      }
      // merge collinear runs, map to coordinates
      val n = verts.length
      val keep = (0 until n).filter { vi =>
        val p = verts((vi - 1 + n) % n); val c = verts(vi); val q = verts((vi + 1) % n)
        !((p._1 == c._1 && c._1 == q._1) || (p._2 == c._2 && c._2 == q._2))
      }
      val ring = new Array[Double](keep.length * 2)
      keep.zipWithIndex.foreach { case (vi, o) =>
        ring(2 * o) = xs(verts(vi)._1); ring(2 * o + 1) = ys(verts(vi)._2)
      }
      rings += ring
    }

    // shoelace over assembled rings (outer CCW positive, holes negative)
    var shoelace = 0.0
    rings.foreach { r =>
      val m = r.length / 2
      var k = 0
      while (k < m) {
        val k2 = (k + 1) % m
        shoelace += r(2 * k) * r(2 * k2 + 1) - r(2 * k2) * r(2 * k + 1)
        k += 1
      }
    }
    Union(shoelace / 2.0, rings.toSeq)
  }
}
