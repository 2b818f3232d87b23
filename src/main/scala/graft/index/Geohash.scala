package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash (base-32 interleaved lat/lon) cell index — the third public cell
  * scheme next to the Morton quadtree ([[GridCell]]) and the S2 cube-face
  * quadtree ([[S2Cell]]), and the one most external datasets carry. Built
  * as pure integer/bit arithmetic so it stays inside whole-stage codegen
  * and mirrors bit-for-bit into ANSI SQL:
  *
  *   gx = floor((lon+180)/360 · 2^lonBits),  gy likewise over latitude,
  *   z  = bit-interleave starting with longitude (the geohash convention),
  *   chars = 5-bit groups of z through the base-32 alphabet.
  *
  * `(lon+180)/360` is computed ONCE and then multiplied by a power of two
  * (exact in IEEE), so a precision-p geohash is a string prefix of any
  * higher-precision geohash of the same point — the property that makes
  * geohash prefixes usable as a hierarchical equi-join/partition key.
  */
object Geohash {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  val MaxPrecision = 12 // 60 bits — the most a Long can carry

  def lonBits(p: Int): Int = (5 * p + 1) / 2
  def latBits(p: Int): Int = (5 * p) / 2

  private def axisIndex(v: Double, lo: Double, span: Double, bits: Int): Long = {
    val n = 1L << bits
    val i = math.floor((v - lo) / span * n).toLong
    math.min(math.max(i, 0L), n - 1)
  }

  /** Bits of a (< 2^32) value spread to even positions (bit i -> bit 2i). */
  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** The 5p-bit interleaved index (lon bit first, per the geohash spec). */
  def zValue(lon: Double, lat: Double, p: Int): Long = {
    require(p >= 1 && p <= MaxPrecision, s"geohash precision out of range: $p")
    val gx = axisIndex(lon, -180.0, 360.0, lonBits(p))
    val gy = axisIndex(lat, -90.0, 180.0, latBits(p))
    // even total bits: stream starts AND ends with lat -> lon sits on odd
    // positions; odd total: lon takes both ends -> lon on even positions.
    if (5 * p % 2 == 0) (spread(gx) << 1) | spread(gy)
    else spread(gx) | (spread(gy) << 1)
  }

  def encode(lon: Double, lat: Double, p: Int): String = {
    val z = zValue(lon, lat, p)
    val sb = new StringBuilder(p)
    var i = 0
    while (i < p) { sb.append(Alphabet.charAt(((z >>> (5 * (p - 1 - i))) & 31L).toInt)); i += 1 }
    sb.toString
  }

  private def spreadCol(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xffffffffL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  private def axisIndexCol(v: Column, lo: Double, span: Double, bits: Int): Column = {
    val n = 1L << bits
    least(greatest(floor((v - lit(lo)) / lit(span) * lit(n.toDouble)).cast("long"),
      lit(0L)), lit(n - 1))
  }

  /** Column form of [[encode]] — the same arithmetic as plain functions
    * (no UDF, no custom expression: one codegen span).
    */
  def encodeCol(lon: Column, lat: Column, p: Int): Column = {
    require(p >= 1 && p <= MaxPrecision, s"geohash precision out of range: $p")
    val gx = spreadCol(axisIndexCol(lon, -180.0, 360.0, lonBits(p)))
    val gy = spreadCol(axisIndexCol(lat, -90.0, 180.0, latBits(p)))
    val z = if (5 * p % 2 == 0) shiftleft(gx, 1).bitwiseOR(gy)
            else gx.bitwiseOR(shiftleft(gy, 1))
    concat((0 until p).map { i =>
      val idx = shiftrightunsigned(z, 5 * (p - 1 - i)).bitwiseAND(lit(31L))
      lit(Alphabet).substr(idx.cast("int") + lit(1), lit(1))
    }: _*)
  }
}
