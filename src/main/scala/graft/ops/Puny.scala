package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Punycode (RFC 3492) and IDNA host forms — the web-scale URL
  * normalization step that makes `xn--mnchen-3ya.de` and `münchen.de`
  * the same host for dedup/blocking/stats. Implemented from the RFC's
  * parameter set (base 36, tmin 1, tmax 26, skew 38, damp 700) with the
  * published bias-adaptation function; both directions, so the spec can
  * prove decode∘encode = id on arbitrary strings and cross-validate
  * against the JDK's java.net.IDN on the ACE corpus.
  *
  * Host-level: each dot-separated label starting with `xn--`
  * (case-insensitive) decodes; others pass through lowercased. Strict
  * per the container adjudications: malformed ACE labels raise.
  */
object Puny {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew))
  }

  private def digitValue(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else throw new IllegalArgumentException(s"punycode: bad digit '$c'")

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  /** Decode one punycode label body (the part after `xn--`). */
  def decodeLabel(input: String): String = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"punycode: $msg in '$input'")
    val lastDelim = input.lastIndexOf('-')
    val output = new java.lang.StringBuilder()
    if (lastDelim > 0) {
      for (c <- input.substring(0, lastDelim)) {
        if (c >= 128) fail("non-basic code point before delimiter")
        output.append(c)
      }
    }
    var p = if (lastDelim > 0) lastDelim + 1 else 0
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (p < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (p >= input.length) fail("truncated variable-length integer")
        val digit = digitValue(input.charAt(p)); p += 1
        if (digit > (Int.MaxValue - i) / w) fail("overflow")
        i += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) fail("overflow")
          w *= Base - t
          k += Base
        }
      }
      val outLen = output.codePointCount(0, output.length) + 1
      bias = adapt(i - oldi, outLen, oldi == 0)
      if (i / outLen > Int.MaxValue - n) fail("overflow")
      n += i / outLen
      i %= outLen
      if (n < 128) fail("basic code point from extended part")
      if (!Character.isValidCodePoint(n)) fail(s"invalid code point $n")
      // insert code point n at position i (in code points)
      val insertAt = output.offsetByCodePoints(0, i)
      output.insert(insertAt, Character.toChars(n))
      i += 1
    }
    output.toString
  }

  /** Encode a Unicode label to its punycode body (RFC 3492 §6.3). */
  def encodeLabel(input: String): String = {
    val cps = input.codePoints().toArray
    val out = new java.lang.StringBuilder()
    val basic = cps.filter(_ < 128)
    basic.foreach(c => out.append(c.toChar))
    var h = basic.length
    val b = basic.length
    if (b > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < cps.length) {
      val m = cps.filter(_ >= n).min
      delta += (m - n) * (h + 1)
      n = m
      for (c <- cps) {
        if (c < n) delta += 1
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** IDNA display form of a host: each `xn--` label decoded, every
    * label lowercased.
    */
  def decodeHost(host: String): String =
    // -1 limit: trailing empty labels survive (a root-dot host
    // 'example.com.' must round-trip; plain split drops them and
    // decode(encode(h)) stopped being identity)
    host.split("\\.", -1).map { label =>
      val lower = label.toLowerCase
      if (lower.startsWith("xn--")) decodeLabel(lower.substring(4))
      else lower
    }.mkString(".")

  /** IDNA ACE form of a host: each label with non-ASCII code points
    * punycode-encoded under the `xn--` prefix.
    */
  def encodeHost(host: String): String =
    host.split("\\.", -1).map { label =>
      val lower = label.toLowerCase
      if (lower.forall(_ < 128)) lower else "xn--" + encodeLabel(lower)
    }.mkString(".")

  /** Partition-batched host normalization: adds `display` (decoded) and
    * `ace` (re-encoded canonical) columns — map-only, the URL-dedup
    * pre-join step at crawl scale.
    */
  def idnTable(df: DataFrame, hostCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("host_id").cast("long"), col(hostCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, host) =>
          val display = decodeHost(host)
          (id, host, display, encodeHost(display))
        }
      }
      .toDF("host_id", "host", "display", "ace")
  }
}
