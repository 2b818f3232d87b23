package graft.ops

import java.util.Arrays

/** From-scratch DEFLATE decoder (RFC 1951) plus the zlib (RFC 1950)
  * wrapper — the decode half of the codec under every gzip WARC member
  * and every PNG IDAT stream this engine ingests. Byte/bit-level from
  * the RFC only: LSB-first bit reader, stored blocks, fixed Huffman,
  * dynamic Huffman with the 19-symbol code-length alphabet (16/17/18
  * repeats), canonical-code decoding via per-length count/offset tables
  * (the RFC 1951 §3.2.2 construction), 32k back-reference copies.
  *
  * Strict: malformed input raises a diagnostic IllegalArgumentException
  * (over-subscribed or incomplete Huffman sets, distances beyond
  * history, truncation — the Mp4/Warc adjudication). The ENCODE side
  * intentionally stays java.util.zip.Deflater: compression is an
  * environment pin like ImageIO in the JPEG study (any RFC-valid bytes
  * are acceptable), while decode is the ingestion-critical direction at
  * corpus scale — and InflateSpec cross-validates this decoder against
  * Deflater output across levels and strategies, both wrappers.
  */
object Inflate {

  private final class BitReader(src: Array[Byte], var pos: Int) {
    var bitBuf: Long = 0L
    var bitCnt: Int = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"inflate: $msg at byte $pos")
    def need(n: Int): Unit = {
      while (bitCnt < n) {
        if (pos >= src.length) fail("truncated stream")
        bitBuf |= (src(pos) & 0xffL) << bitCnt
        pos += 1; bitCnt += 8
      }
    }
    def bits(n: Int): Int = {
      need(n)
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n; bitCnt -= n
      v
    }
    def alignByte(): Unit = { val drop = bitCnt % 8; bitBuf >>>= drop; bitCnt -= drop }
  }

  /** Canonical Huffman decoder from code lengths (RFC 1951 §3.2.2):
    * per-length symbol counts and first-code offsets; decode walks one
    * bit at a time accumulating the code MSB-first.
    */
  private final class Huffman(lengths: Array[Int], what: String) {
    val maxLen = 15
    val count = new Array[Int](maxLen + 1)
    for (l <- lengths if l > 0) {
      if (l > maxLen) throw new IllegalArgumentException(s"inflate: $what code length $l")
      count(l) += 1
    }
    // completeness check (allow the degenerate 1-code case zlib permits
    // for distance trees: a single code of length 1)
    var left = 1
    for (l <- 1 to maxLen) {
      left <<= 1
      left -= count(l)
      if (left < 0)
        throw new IllegalArgumentException(s"inflate: over-subscribed $what code set")
    }
    val incomplete = left > 0
    val offsets = new Array[Int](maxLen + 2)
    for (l <- 1 to maxLen) offsets(l + 1) = offsets(l) + count(l)
    val symbols = new Array[Int](lengths.count(_ > 0))
    private val fill = offsets.clone()
    for (s <- lengths.indices if lengths(s) > 0) {
      symbols(fill(lengths(s))) = s
      fill(lengths(s)) += 1
    }
    def decode(br: BitReader): Int = {
      var code = 0; var first = 0; var index = 0
      var l = 1
      while (l <= maxLen) {
        code |= br.bits(1)
        val cnt = count(l)
        if (code - first < cnt) return symbols(index + (code - first))
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        l += 1
      }
      br.fail(s"invalid $what code")
    }
  }

  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23,
    27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
    6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3,
    13, 2, 14, 1, 15)

  private lazy val fixedLit: Huffman = {
    val l = new Array[Int](288)
    for (i <- 0 until 144) l(i) = 8
    for (i <- 144 until 256) l(i) = 9
    for (i <- 256 until 280) l(i) = 7
    for (i <- 280 until 288) l(i) = 8
    new Huffman(l, "fixed literal")
  }
  private lazy val fixedDist: Huffman = new Huffman(Array.fill(30)(5), "fixed distance")

  /** Raw DEFLATE decompress (the Inflater(true) surface). */
  def inflate(src: Array[Byte]): Array[Byte] = inflate(src, 0)._1

  /** Raw DEFLATE decompress starting at `from`; returns (output, bytes
    * consumed including the final partial byte).
    */
  def inflate(src: Array[Byte], from: Int): (Array[Byte], Int) = {
    val br = new BitReader(src, from)
    var out = new Array[Byte](math.max(64, (src.length - from) * 4))
    var o = 0
    def ensure(extra: Int): Unit =
      if (o + extra > out.length) {
        var cap = out.length
        while (cap < o + extra) cap *= 2
        out = Arrays.copyOf(out, cap)
      }
    var fin = false
    while (!fin) {
      fin = br.bits(1) == 1
      br.bits(2) match {
        case 0 => // stored
          br.alignByte()
          // LEN/NLEN/data may partly sit in the bit buffer; bits() raises
          // on truncation
          val len = br.bits(16)
          val nlen = br.bits(16)
          if ((len ^ 0xffff) != nlen) br.fail("stored LEN/NLEN mismatch")
          ensure(len)
          var i = 0
          while (i < len) { out(o) = br.bits(8).toByte; o += 1; i += 1 }
        case tpe @ (1 | 2) =>
          val (lit, dist) =
            if (tpe == 1) (fixedLit, fixedDist)
            else {
              val hlit = br.bits(5) + 257
              val hdist = br.bits(5) + 1
              val hclen = br.bits(4) + 4
              val clLens = new Array[Int](19)
              for (i <- 0 until hclen) clLens(ClOrder(i)) = br.bits(3)
              val cl = new Huffman(clLens, "code-length")
              if (cl.incomplete && clLens.count(_ > 0) != 1)
                br.fail("incomplete code-length code set")
              val lens = new Array[Int](hlit + hdist)
              var i = 0
              while (i < lens.length) {
                cl.decode(br) match {
                  case 16 =>
                    if (i == 0) br.fail("repeat with no previous length")
                    val r = 3 + br.bits(2)
                    if (i + r > lens.length) br.fail("repeat overruns lengths")
                    val prev = lens(i - 1)
                    for (_ <- 0 until r) { lens(i) = prev; i += 1 }
                  case 17 =>
                    val r = 3 + br.bits(3)
                    if (i + r > lens.length) br.fail("zero-run overruns lengths")
                    i += r
                  case 18 =>
                    val r = 11 + br.bits(7)
                    if (i + r > lens.length) br.fail("zero-run overruns lengths")
                    i += r
                  case s =>
                    lens(i) = s; i += 1
                }
              }
              if (lens(256) == 0) br.fail("no end-of-block code")
              val litH = new Huffman(lens.take(hlit), "literal/length")
              if (litH.incomplete) br.fail("incomplete literal code set")
              val distLens = lens.drop(hlit)
              val distH = new Huffman(distLens, "distance")
              if (distH.incomplete && distLens.count(_ > 0) > 1)
                br.fail("incomplete distance code set")
              (litH, distH)
            }
          var end = false
          while (!end) {
            val sym = lit.decode(br)
            if (sym < 256) { ensure(1); out(o) = sym.toByte; o += 1 }
            else if (sym == 256) end = true
            else {
              if (sym > 285) br.fail(s"invalid length symbol $sym")
              val len = LenBase(sym - 257) + br.bits(LenExtra(sym - 257))
              val dsym = dist.decode(br)
              if (dsym > 29) br.fail(s"invalid distance symbol $dsym")
              val d = DistBase(dsym) + br.bits(DistExtra(dsym))
              if (d > o) br.fail(s"distance $d beyond ${o} bytes of history")
              ensure(len)
              var k = 0
              while (k < len) { out(o + k) = out(o + k - d); k += 1 }
              o += len
            }
          }
        case 3 => br.fail("reserved block type")
      }
    }
    // consumed = bytes pulled into the reader minus WHOLE bytes still
    // unused in the bit buffer (the final partial byte counts as read)
    (Arrays.copyOf(out, o), br.pos - br.bitCnt / 8 - from)
  }

  /** zlib (RFC 1950) decompress: CMF/FLG check, raw inflate, Adler-32
    * verify — the Inflater() (non-raw) surface PNG IDAT uses.
    */
  def zlibDecompress(src: Array[Byte]): Array[Byte] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"zlib: $msg")
    if (src.length < 6) fail("too short")
    val cmf = src(0) & 0xff
    val flg = src(1) & 0xff
    if ((cmf & 0x0f) != 8) fail(s"unsupported method ${cmf & 0x0f}")
    if ((cmf * 256 + flg) % 31 != 0) fail("header check failed")
    if ((flg & 0x20) != 0) fail("preset dictionary not supported")
    val (out, used) = inflate(src, 2)
    if (2 + used + 4 > src.length) fail("truncated Adler-32 trailer")
    var a = 1L; var b = 0L
    var i = 0
    while (i < out.length) {
      a = (a + (out(i) & 0xff)) % 65521
      b = (b + a) % 65521
      i += 1
    }
    val adler = ((b << 16) | a) & 0xffffffffL
    val p = 2 + used
    val want = ((src(p) & 0xffL) << 24) | ((src(p + 1) & 0xffL) << 16) |
      ((src(p + 2) & 0xffL) << 8) | (src(p + 3) & 0xffL)
    if (adler != want) fail(f"Adler-32 mismatch: got $adler%08x want $want%08x")
    out
  }
}
