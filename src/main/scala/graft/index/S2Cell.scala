package graft.index

import graft.geo.BBox

/** S2-style cube-face quadtree cell index, implemented from the published
  * S2 geometry construction (cube face selection by dominant axis, the
  * quadratic u↔s transform, Morton-ordered i/j within a face). Cell ids
  * pack `(face, level, morton(i, j))` into one Long.
  *
  * This is the second index family the north rule names next to the hex
  * cells in [[HexCell]] — exact integer arithmetic per face; v1 scope is
  * encode/decode/parent/children/containment + envelope cover (cross-face
  * neighbor walks are staged).
  *
  * Layout: bits 61..63 = face (0..5), bits 56..60 = level (0..27),
  * bits 0..55 = morton(i, j) at `level` bits each.
  */
object S2Cell {
  val MaxLevel = 27

  /** lon/lat degrees → unit-sphere xyz. */
  private def toXyz(lon: Double, lat: Double): (Double, Double, Double) = {
    val phi = math.toRadians(lat)
    val theta = math.toRadians(lon)
    val cosPhi = math.cos(phi)
    (cosPhi * math.cos(theta), cosPhi * math.sin(theta), math.sin(phi))
  }

  /** Face (0..5) by dominant axis: 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z. */
  private def face(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) { if (x >= 0) 0 else 3 }
    else if (ay >= az) { if (y >= 0) 1 else 4 }
    else { if (z >= 0) 2 else 5 }
  }

  /** (u, v) in [-1, 1] on the given face. */
  private def faceUv(f: Int, x: Double, y: Double, z: Double): (Double, Double) = f match {
    case 0 => (y / x, z / x)
    case 1 => (-x / y, z / y)
    case 2 => (-x / z, -y / z)
    case 3 => (z / x, y / x)     // x < 0
    case 4 => (z / y, -x / y)    // y < 0
    case 5 => (-y / z, -x / z)   // z < 0
  }

  private def uvToXyz(f: Int, u: Double, v: Double): (Double, Double, Double) = f match {
    case 0 => (1, u, v)
    case 1 => (-u, 1, v)
    case 2 => (-u, -v, 1)
    case 3 => (-1, -v, -u)
    case 4 => (v, -1, -u)
    case 5 => (v, u, -1)
  }

  /** S2 quadratic projection u → s in [0, 1] (published formula). */
  def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u)
    else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

  def encode(lon: Double, lat: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level out of range: $level")
    val (x, y, z) = toXyz(lon, lat)
    val f = face(x, y, z)
    val (u, v) = faceUv(f, x, y, z)
    val n = 1L << level
    def toIj(w: Double): Long =
      math.min(n - 1, math.max(0L, math.floor(uvToSt(w) * n).toLong))
    pack(f, toIj(u), toIj(v), level)
  }

  def pack(f: Int, i: Long, j: Long, level: Int): Long =
    (f.toLong << 61) | (level.toLong << 56) | interleave(i) | (interleave(j) << 1)

  def face(cell: Long): Int = ((cell >>> 61) & 0x7).toInt
  def level(cell: Long): Int = ((cell >>> 56) & 0x1f).toInt
  def i(cell: Long): Long = deinterleave(cell & 0x00ffffffffffffffL)
  def j(cell: Long): Long = deinterleave((cell & 0x00ffffffffffffffL) >>> 1)

  def parent(cell: Long): Long = {
    val l = level(cell)
    require(l > 0, "face cell has no parent")
    pack(face(cell), i(cell) >> 1, j(cell) >> 1, l - 1)
  }

  /** Ancestor `steps` levels up. Exactly the cell `encode` would produce
    * at the coarser level: floor(st·2^l) >> s == floor(st·2^(l−s)), and
    * the clamp commutes with the shift.
    */
  def parentN(cell: Long, steps: Int): Long = {
    val l = level(cell)
    require(steps >= 0 && steps <= l, s"cannot go $steps levels up from level $l")
    pack(face(cell), i(cell) >> steps, j(cell) >> steps, l - steps)
  }

  def children(cell: Long): Array[Long] = {
    val l = level(cell); val ci = i(cell) << 1; val cj = j(cell) << 1
    Array(pack(face(cell), ci, cj, l + 1), pack(face(cell), ci + 1, cj, l + 1),
      pack(face(cell), ci, cj + 1, l + 1), pack(face(cell), ci + 1, cj + 1, l + 1))
  }

  /** Center of the cell in (lon, lat) degrees. */
  def centerLonLat(cell: Long): (Double, Double) = {
    val l = level(cell); val n = (1L << l).toDouble
    val u = stToUv((i(cell) + 0.5) / n)
    val v = stToUv((j(cell) + 0.5) / n)
    val (x, y, z) = uvToXyz(face(cell), u, v)
    (math.toDegrees(math.atan2(y, x)),
      math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))))
  }

  /** True if (lon, lat) encodes into `cell` (or a descendant of it). */
  def contains(cell: Long, lon: Double, lat: Double): Boolean = {
    val c = encode(lon, lat, level(cell))
    c == cell
  }

  /** Cells at `level` covering a lon/lat envelope via center sampling.
    * Sample density SCALES WITH THE CELL SIZE at the requested level
    * (≳2 samples per cell edge; a fixed lattice under-covered fine
    * levels — ADVICE r1), capped at 2048 steps per axis; the result can
    * still be a slight under-estimate for cells clipped to slivers at
    * the bbox edge or when the cap binds, so treat it as a candidate
    * PRUNE for a downstream exact refine, never as an exact cover.
    */
  def cover(b: BBox, lvl: Int): Array[Long] = {
    val set = new scala.collection.mutable.LinkedHashSet[Long]()
    // angular cell edge at this level is ~90°/2^lvl on a face (±50% from
    // the quadratic s↔t stretching); sample at ≤ half that
    val cellDeg = 90.0 / (1L << lvl).toDouble
    def stepsFor(span: Double): Int =
      math.max(24, math.min(2048, math.ceil(span / (cellDeg * 0.4)).toInt))
    val sx = stepsFor(b.xMax - b.xMin)
    val sy = stepsFor(b.yMax - b.yMin)
    var yi = 0
    while (yi <= sy) {
      val lat = b.yMin + (b.yMax - b.yMin) * yi / sy
      var xi = 0
      while (xi <= sx) {
        val lon = b.xMin + (b.xMax - b.xMin) * xi / sx
        set += encode(lon, lat, lvl)
        xi += 1
      }
      yi += 1
    }
    set.toArray
  }

  /** One-step neighbor in face-local (di, dj) ∈ {-1,0,1}² with CROSS-FACE
    * wrap — the published S2 FromFaceIJWrap construction: extrapolate the
    * would-be cell center to face-plane (u, v) with the LINEAR st↔uv map
    * (clamped just outside ±1), lift to xyz (a point beyond the face
    * boundary), re-project onto the owning face, and invert with the same
    * linear map. Using the linear projection in both directions makes the
    * round trip exact for grid centers (cell centers land on half-integer
    * grid coordinates; a 1-ulp perturbation cannot cross a cell line).
    * Returns None for a diagonal step off a cube corner (3-valent corners
    * have no diagonal neighbor).
    */
  def neighborWrap(cell: Long, di: Int, dj: Int): Option[Long] = {
    val l = level(cell); val n = 1L << l
    val ni = i(cell) + di; val nj = j(cell) + dj
    val iOut = ni < 0 || ni >= n
    val jOut = nj < 0 || nj >= n
    if (!iOut && !jOut) return Some(pack(face(cell), ni, nj, l))
    if (iOut && jOut) return None // off a cube corner
    val lim = 1.0 + 1e-15
    def lin(k: Long) = math.max(-lim, math.min(lim, 2.0 * (k + 0.5) / n - 1.0))
    val (x, y, z) = uvToXyz(face(cell), lin(ni), lin(nj))
    val f2 = face(x, y, z)
    val (u2, v2) = faceUv(f2, x, y, z)
    def toIj(u: Double) =
      math.min(n - 1, math.max(0L, math.floor((u + 1.0) * 0.5 * n).toLong))
    Some(pack(f2, toIj(u2), toIj(v2), l))
  }

  /** All 8 edge/vertex neighbors (7 at cube corners), cross-face. */
  def neighbors(cell: Long): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var dj = -1
    while (dj <= 1) {
      var di = -1
      while (di <= 1) {
        if (di != 0 || dj != 0) neighborWrap(cell, di, dj).foreach(out += _)
        di += 1
      }
      dj += 1
    }
    out.distinct.toArray
  }

  /** Cells within k neighbor steps (inclusive of `cell`), cross-face —
    * BFS over the 8-neighborhood, so within one face it equals the
    * Chebyshev-disk k-ring and across edges/corners it wraps onto the
    * adjacent faces. Result is sorted for deterministic join keys.
    */
  def kRing(cell: Long, k: Int): Array[Long] = {
    var frontier = Set(cell)
    var seen = Set(cell)
    var step = 0
    while (step < k && frontier.nonEmpty) {
      frontier = frontier.flatMap(c => neighbors(c)).diff(seen)
      seen = seen ++ frontier
      step += 1
    }
    val arr = seen.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  private def interleave(v: Long): Long = {
    var x = v & 0x0fffffffL
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
