package graft.index

/** Hilbert space-filling curve over the 2^level × 2^level tile grid — the
  * locality-preserving scan order for tile storage and range clustering
  * (consecutive curve positions are ALWAYS rook-adjacent cells, unlike the
  * Morton order whose quadrant seams jump across the map). Sorting or
  * bucketing a 10¹²-row tile table by the Hilbert index keeps spatially
  * close tiles in the same file/partition, which is what makes windowed
  * raster reads and neighborhood joins IO-local at scale.
  *
  * The classic iterated rotate/reflect walk (Hilbert 1891, in the integer
  * formulation): pure 64-bit integer ops per level, so the encoder is one
  * codegen'd expression and the DuckDB oracle replays it as an unrolled
  * per-level CTE chain, bit for bit.
  */
object Hilbert {
  val MaxLevel = 31 // d occupies 2·level bits

  /** Curve position d ∈ [0, 4^level) of cell (x, y); x/y clamp into range
    * (defensive — upstream cell indexes are already in range).
    */
  def xy2d(level: Int, x0: Long, y0: Long): Long = {
    require(level >= 1 && level <= MaxLevel, s"hilbert: level out of range: $level")
    val n = 1L << level
    var x = math.min(math.max(x0, 0L), n - 1)
    var y = math.min(math.max(y0, 0L), n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk: cell (x, y) of curve position d. */
  def d2xy(level: Int, d: Long): (Long, Long) = {
    require(level >= 1 && level <= MaxLevel, s"hilbert: level out of range: $level")
    require(d >= 0 && d < (1L << (2 * level)), s"hilbert: d out of range: $d")
    var x = 0L; var y = 0L
    var t = d
    var s = 1L
    while (s < (1L << level)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
