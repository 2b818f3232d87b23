package graft.ops

import java.io.ByteArrayOutputStream

/** Dependency-free baseline TIFF 6.0 codec with GeoTIFF georeferencing —
  * THE raster interchange container of the reference's world (buteo
  * reads/writes GeoTIFF through GDAL; here the container itself is
  * parsed from scratch, so binary raster columns round-trip to pixels
  * AND to their geotransform without any native library).
  *
  * Scope: uncompressed (Compression = 1) or PackBits (32773, the
  * TIFF 6.0 §9 RLE), stripped, 8-bit grayscale or
  * interleaved RGB; BOTH byte orders on read (`II` little / `MM` big),
  * little-endian on write; georeferencing via the standard north-up
  * GeoTIFF encoding — ModelPixelScaleTag (33550, sx sy sz) plus one
  * ModelTiepointTag (33922, i j k → x y z), from which
  * originX = x − i·sx, originY = y + j·sy, pxW = sx, pxH = −sy.
  * Multi-strip files concatenate in strip order. Malformed input
  * (bad magic, truncated IFD, out-of-range strip, unsupported
  * compression/bit depth) rejects with a descriptive exception — never
  * an index error deep in a loop.
  */
object Tiff {

  final case class GeoTiff(width: Int, height: Int, channels: Int,
                           pixels: Array[Byte],
                           originX: Double, originY: Double,
                           pxW: Double, pxH: Double)

  // ---- little-endian writers (encode side) ----
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def leDouble(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte).toArray
  }

  /** Encode 8-bit gray (channels = 1) or RGB (3) with the geotransform.
    * Single strip, little-endian, ready for [[decode]] or any TIFF
    * reader.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             originX: Double, originY: Double,
             pxW: Double, pxH: Double): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels 1|3, got $channels")
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    require(pxW > 0 && pxH < 0, "north-up geotransform needs pxW>0, pxH<0")
    val nEntries = 11
    val ifdStart = 8
    val ifdSize = 2 + nEntries * 12 + 4
    var cursor = ifdStart + ifdSize
    val bpsOffset = cursor
    if (channels == 3) cursor += 6 // 3 SHORTs out of line
    val scaleOffset = cursor; cursor += 24 // 3 doubles
    val tieOffset = cursor; cursor += 48   // 6 doubles
    val stripOffset = cursor
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte]('I', 'I')); out.write(le16(42)); out.write(le32(ifdStart))
    out.write(le16(nEntries))
    def entry(tag: Int, tpe: Int, count: Int, value: Int): Unit = {
      out.write(le16(tag)); out.write(le16(tpe)); out.write(le32(count))
      // SHORT values sit in the low half of the 4-byte value slot
      if (tpe == 3 && count == 1) { out.write(le16(value)); out.write(le16(0)) }
      else out.write(le32(value))
    }
    entry(256, 3, 1, width)
    entry(257, 3, 1, height)
    if (channels == 1) entry(258, 3, 1, 8) else entry(258, 3, 3, bpsOffset)
    entry(259, 3, 1, 1)                        // no compression
    entry(262, 3, 1, if (channels == 1) 1 else 2) // BlackIsZero | RGB
    entry(273, 4, 1, stripOffset)
    entry(277, 3, 1, channels)
    entry(278, 3, 1, height)                   // one strip
    entry(279, 4, 1, pixels.length)
    entry(33550, 12, 3, scaleOffset)           // ModelPixelScale
    entry(33922, 12, 6, tieOffset)             // ModelTiepoint
    out.write(le32(0)) // next-IFD pointer
    if (channels == 3) { out.write(le16(8)); out.write(le16(8)); out.write(le16(8)) }
    out.write(leDouble(pxW)); out.write(leDouble(-pxH)); out.write(leDouble(0.0))
    // tiepoint: raster (0,0,0) pins to (originX, originY, 0)
    out.write(leDouble(0.0)); out.write(leDouble(0.0)); out.write(leDouble(0.0))
    out.write(leDouble(originX)); out.write(leDouble(originY)); out.write(leDouble(0.0))
    out.write(pixels)
    out.toByteArray
  }

  /** TIFF LZW strip decode (TIFF 6.0 §13): MSB-first bit packing,
    * Clear = 256, EOI = 257, 9→12-bit codes with libtiff's EARLY
    * code-width change (the width bumps when the dictionary reaches
    * 2^w − 1, one entry before GIF's rule — pinned by ImageIO
    * cross-validation exactly like the GIF width-bump study).
    * Returns bytes written into `out` starting at `outOff`.
    */
  private def lzwDecode(bytes: Array[Byte], off: Int, len: Int,
                        out: Array[Byte], outOff: Int, outCap: Int): Int = {
    val Clear = 256; val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var nextCode = 258
    var codeSize = 9
    var bitPos = off.toLong * 8
    val endBit = (off + len).toLong * 8
    var written = 0
    var prev = -1
    def read(): Int = {
      if (bitPos + codeSize > endBit) Eoi
      else {
        var v = 0; var i = 0
        while (i < codeSize) {
          val b = bytes((bitPos >> 3).toInt) & 0xff
          v = (v << 1) | ((b >> (7 - (bitPos & 7)).toInt) & 1)
          bitPos += 1; i += 1
        }
        v
      }
    }
    var done = false
    while (!done) {
      val code = read()
      if (code == Eoi) done = true
      else if (code == Clear) { nextCode = 258; codeSize = 9; prev = -1 }
      else {
        require(code <= nextCode && code < 4096,
          s"tiff: LZW code $code beyond dictionary $nextCode")
        // expand (KwKwK: code == nextCode repeats prev's first byte)
        var sp = 0
        var c = if (code == nextCode) {
          require(prev >= 0, "tiff: LZW KwKwK with no previous code")
          stack(sp) = firstByte(prefix, suffix, prev); sp += 1; prev
        } else code
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        stack(sp) = c.toByte; sp += 1
        require(written + sp <= outCap, "tiff: LZW output overruns strip")
        var i = sp - 1
        while (i >= 0) { out(outOff + written) = stack(i); written += 1; i -= 1 }
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = stack(sp - 1) // first byte of this expansion
          nextCode += 1
        }
        if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    written
  }

  private def firstByte(prefix: Array[Int], suffix: Array[Byte], code0: Int): Byte = {
    var c = code0
    while (c >= 258) c = prefix(c)
    c.toByte
  }

  private final class Reader(b: Array[Byte], big: Boolean) {
    def u16(off: Int): Int = {
      checked(off, 2)
      if (big) ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      else ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)
    }
    def u32(off: Int): Long = {
      checked(off, 4)
      if (big)
        ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      else
        ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
          ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)
    }
    def dbl(off: Int): Double = {
      checked(off, 8)
      var bits = 0L
      var i = 0
      while (i < 8) {
        val byte = b(off + (if (big) i else 7 - i)) & 0xffL
        bits = (bits << 8) | byte
        i += 1
      }
      java.lang.Double.longBitsToDouble(bits)
    }
    def checked(off: Int, n: Int): Unit =
      if (off < 0 || off + n > b.length)
        throw new IllegalArgumentException(
          s"tiff: truncated read at $off+$n of ${b.length}")
  }

  /** Field values for one IFD entry, widened to Long (SHORT/LONG) or
    * read as doubles by the caller via the stored (type, count, at). */
  private final case class Field(tpe: Int, count: Int, at: Int, inline: Boolean)

  def decode(bytes: Array[Byte]): GeoTiff = {
    require(bytes.length >= 8, "tiff: shorter than a header")
    val big = (bytes(0), bytes(1)) match {
      case ('I', 'I') => false
      case ('M', 'M') => true
      case _ => throw new IllegalArgumentException("tiff: bad byte-order mark")
    }
    val r = new Reader(bytes, big)
    require(r.u16(2) == 42, "tiff: bad magic")
    val ifd = r.u32(4).toInt
    val n = r.u16(ifd)
    require(n > 0 && ifd + 2 + n * 12 + 4 <= bytes.length, "tiff: truncated IFD")
    val fields = (0 until n).map { i =>
      // entry layout: tag(2) type(2) count(4) value-or-offset(4)
      val e = ifd + 2 + i * 12
      val tag = r.u16(e)
      val tpe = r.u16(e + 2)
      val count = r.u32(e + 4).toInt
      val size = tpe match {
        case 1 => 1; case 3 => 2; case 4 => 4; case 12 => 8
        case _ => 0
      }
      val inline = size > 0 && size * count <= 4
      val at = if (inline) e + 8 else r.u32(e + 8).toInt
      tag -> Field(tpe, count, at, inline)
    }.toMap
    def num(tag: Int, idx: Int = 0): Long = {
      val f = fields.getOrElse(tag,
        throw new IllegalArgumentException(s"tiff: missing tag $tag"))
      f.tpe match {
        case 3 => r.u16(f.at + 2 * idx).toLong
        case 4 => r.u32(f.at + 4 * idx)
        case t => throw new IllegalArgumentException(s"tiff: tag $tag type $t not integral")
      }
    }
    def dbls(tag: Int): Array[Double] = {
      val f = fields.getOrElse(tag,
        throw new IllegalArgumentException(s"tiff: missing tag $tag"))
      require(f.tpe == 12, s"tiff: tag $tag is not DOUBLE")
      (0 until f.count).map(i => r.dbl(f.at + 8 * i)).toArray
    }
    val width = num(256).toInt; val height = num(257).toInt
    require(width > 0 && height > 0, s"tiff: bad dimensions ${width}x$height")
    val compression = num(259)
    require(compression == 1 || compression == 5 || compression == 32773,
      s"tiff: compression $compression unsupported (1 none, 5 LZW, 32773 PackBits)")
    fields.get(317).foreach(_ => require(num(317) == 1,
      s"tiff: predictor ${num(317)} unsupported (only 1)"))
    val channels = fields.get(277).map(_ => num(277).toInt).getOrElse(1)
    require(channels == 1 || channels == 3, s"tiff: $channels samples unsupported")
    val bpsField = fields.getOrElse(258,
      throw new IllegalArgumentException("tiff: missing BitsPerSample"))
    (0 until bpsField.count).foreach(i =>
      require(num(258, i) == 8, "tiff: only 8-bit samples supported"))
    val nStrips = fields(273).count
    require(fields(279).count == nStrips, "tiff: strip offset/count mismatch")
    val pixels = new Array[Byte](width * height * channels)
    var written = 0
    (0 until nStrips).foreach { i =>
      val off = num(273, i).toInt; val len = num(279, i).toInt
      r.checked(off, len)
      if (compression == 1) {
        require(written + len <= pixels.length,
          s"tiff: strips exceed ${pixels.length} bytes")
        System.arraycopy(bytes, off, pixels, written, len)
        written += len
      } else if (compression == 5) {
        written += lzwDecode(bytes, off, len, pixels, written,
          pixels.length - written)
      } else {
        // PackBits (TIFF 6.0 §9): n in [0,127] → copy n+1 literals;
        // n in [-127,-1] → repeat next byte 1−n times; -128 is a no-op
        var p = off
        val end = off + len
        while (p < end) {
          val n = bytes(p).toInt
          p += 1
          if (n >= 0) {
            require(p + n + 1 <= end && written + n + 1 <= pixels.length,
              "tiff: PackBits literal run overruns")
            System.arraycopy(bytes, p, pixels, written, n + 1)
            p += n + 1; written += n + 1
          } else if (n != -128) {
            require(p < end && written + (1 - n) <= pixels.length,
              "tiff: PackBits repeat run overruns")
            java.util.Arrays.fill(pixels, written, written + (1 - n), bytes(p))
            p += 1; written += 1 - n
          }
        }
      }
    }
    require(written == pixels.length,
      s"tiff: strips cover $written of ${pixels.length} bytes")
    // geo tags are optional: a plain (ungeoreferenced) TIFF decodes with
    // the GDAL-style identity transform origin (0,0), pixel (1, -1)
    if (fields.contains(33550) && fields.contains(33922)) {
      val scale = dbls(33550)
      val tie = dbls(33922)
      require(scale.length >= 2 && tie.length >= 6, "tiff: incomplete geo tags")
      val originX = tie(3) - tie(0) * scale(0)
      val originY = tie(4) + tie(1) * scale(1)
      GeoTiff(width, height, channels, pixels, originX, originY,
        scale(0), -scale(1))
    } else
      GeoTiff(width, height, channels, pixels, 0.0, 0.0, 1.0, -1.0)
  }
}
