package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Dependency-free binary codecs for the multimodal column pipeline:
  * a real PNG decoder (signature + chunk walk, concatenated-IDAT zlib
  * inflate via java.util.zip, scanline unfiltering for all five PNG
  * filter types, 8-bit gray/RGB/RGBA) and a WAV PCM-16 parser — plus the
  * matching encoders used to build deterministic fixtures. This replaces
  * the round-1 `decodeStub` (the container has no imaging libraries, but
  * PNG/WAV need none: DEFLATE ships with the JDK).
  *
  * Reference lifecycle being mirrored: buteo treats imagery as arrays
  * entering the patch pipeline (buteo/array/patches); here the decode
  * step itself is real so binary columns round-trip to pixels/samples.
  */
object Codecs {

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(data.length))
    val t = tpe.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  /** Channels per PNG color type (8-bit depths only). */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // rgb
    case 6 => 4 // rgba
    case t => throw new IllegalArgumentException(s"unsupported PNG color type $t")
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit pixels (row-major, `channels` interleaved) as PNG.
    * `filterType` selects the per-row filter (0..4) so decoder tests can
    * exercise every unfilter path.
    */
  def encodePng(width: Int, height: Int, channels: Int, pixels: Array[Byte],
                filterType: Int = 0): Array[Byte] = {
    require(pixels.length == width * height * channels, "pixel buffer size mismatch")
    val colorType = channels match {
      case 1 => 0; case 3 => 2; case 4 => 6
      case c => throw new IllegalArgumentException(s"unsupported channel count $c")
    }
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      raw(y * (1 + stride)) = filterType.toByte
      var i = 0
      while (i < stride) {
        val cur = pixels(y * stride + i) & 0xff
        val left = if (i >= channels) pixels(y * stride + i - channels) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= channels) pixels((y - 1) * stride + i - channels) & 0xff else 0
        val filtered = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
          case f => throw new IllegalArgumentException(s"bad filter $f")
        }
        raw(y * (1 + stride) + 1 + i) = filtered.toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(width)); ihdr.write(be32(height))
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("IDAT", zBuf.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decoded image: 8-bit interleaved pixels. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Real PNG decode: signature check, chunk walk (IDAT chunks may be
    * split), zlib inflate, per-row unfilter (types 0–4).
    */
  def decodePng(bytes: Array[Byte]): Image = {
    require(bytes.length > 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "not a PNG (bad signature)")
    var off = 8
    var width = 0; var height = 0; var colorType = -1
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val len = readBe32(bytes, off)
      val tpe = new String(bytes, off + 4, 4, "US-ASCII")
      val dataOff = off + 8
      tpe match {
        case "IHDR" =>
          width = readBe32(bytes, dataOff)
          height = readBe32(bytes, dataOff + 4)
          val bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          require(bitDepth == 8, s"only 8-bit PNGs supported (got $bitDepth)")
          require((bytes(dataOff + 12) & 0xff) == 0, "interlaced PNGs unsupported")
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip
      }
      off = dataOff + len + 4 // skip crc
    }
    val channels = channelsOf(colorType)
    val stride = width * channels
    // from-scratch zlib decoder (Inflate.scala, Adler-verified);
    // java.util.zip remains the encode side only
    val raw = Inflate.zlibDecompress(idat.toByteArray)
    require(raw.length == height * (1 + stride),
      s"short inflate: ${raw.length} of ${height * (1 + stride)}")

    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + stride)) & 0xff
      var i = 0
      while (i < stride) {
        val v = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= channels) px(y * stride + i - channels) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= channels) px((y - 1) * stride + i - channels) & 0xff else 0
        val rec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad PNG filter $other")
        }
        px(y * stride + i) = (rec & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Image(width, height, channels, px)
  }

  // --- WAV (RIFF PCM-16 mono) ---

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1)) // PCM, mono
    out.write(le32(sampleRate)); out.write(le32(sampleRate * 2))
    out.write(le16(2)); out.write(le16(16)) // block align, bits
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  // --- AVI (RIFF container; frame PAYLOADS stay opaque) ---

  /** Minimal AVI writer for fixtures: RIFF('AVI ') with an 'avih' main
    * header (frame period, count, dimensions) and a 'movi' LIST of
    * '00dc' frame chunks. Payload bytes are caller-provided (opaque).
    */
  def encodeAvi(width: Int, height: Int, usecPerFrame: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = new ByteArrayOutputStream()
    avih.write(le32(usecPerFrame)); avih.write(le32(0)) // maxBytesPerSec
    avih.write(le32(0)); avih.write(le32(0x10))          // padding, flags
    avih.write(le32(frames.size)); avih.write(le32(0))   // totalFrames, initial
    avih.write(le32(1))                                  // streams
    avih.write(le32(0))                                  // suggestedBufferSize
    avih.write(le32(width)); avih.write(le32(height))
    avih.write(new Array[Byte](16))                      // reserved
    val hdrl = new ByteArrayOutputStream()
    hdrl.write("hdrl".getBytes("US-ASCII"))
    hdrl.write("avih".getBytes("US-ASCII")); hdrl.write(le32(avih.size()))
    hdrl.write(avih.toByteArray)
    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      movi.write("00dc".getBytes("US-ASCII")); movi.write(le32(f.length))
      movi.write(f)
      if (f.length % 2 == 1) movi.write(0) // RIFF word alignment
    }
    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write("LIST".getBytes("US-ASCII")); body.write(le32(hdrl.size()))
    body.write(hdrl.toByteArray)
    body.write("LIST".getBytes("US-ASCII")); body.write(le32(movi.size()))
    body.write(movi.toByteArray)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.size()))
    out.write(body.toByteArray)
    out.toByteArray
  }

  /** Parsed AVI: header metadata + raw frame payloads ('00dc'/'00db'
    * chunks inside the 'movi' LIST, still encoded — payload decode is a
    * codec concern, the container walk is not).
    */
  final case class Video(width: Int, height: Int, usecPerFrame: Int,
                         totalFrames: Int, frames: Vector[Array[Byte]])

  def decodeAvi(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not a RIFF/AVI file")
    var width = 0; var height = 0; var usec = 0; var total = 0
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val tpe = new String(bytes, off, 4, "US-ASCII")
        val len = readLe32(bytes, off + 4)
        if (tpe == "LIST") {
          walk(off + 12, off + 8 + len) // skip the 4-byte list type
        } else if (tpe == "avih") {
          usec = readLe32(bytes, off + 8)
          total = readLe32(bytes, off + 24)
          width = readLe32(bytes, off + 40)
          height = readLe32(bytes, off + 44)
        } else if (tpe.endsWith("dc") || tpe.endsWith("db")) {
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        }
        off += 8 + len + (len & 1)
      }
    }
    walk(12, bytes.length)
    Video(width, height, usec, total, frames.result())
  }

  /** Parsed audio: sample rate + PCM-16 samples (chunk walk tolerates
    * extra chunks before/after `data`).
    */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  def decodeWavPcm16(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var rate = 0
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (rate == 0 || samples == null)) {
      val tpe = new String(bytes, off, 4, "US-ASCII")
      val len = readLe32(bytes, off + 4)
      tpe match {
        case "fmt " =>
          require(readLe16(bytes, off + 8) == 1, "only PCM supported")
          require(readLe16(bytes, off + 10) == 1, "only mono supported")
          rate = readLe32(bytes, off + 12)
          require(readLe16(bytes, off + 22) == 16, "only 16-bit supported")
        case "data" =>
          val n = len / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = readLe16(bytes, off + 8 + 2 * i).toShort; i += 1 }
        case _ =>
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    Audio(rate, samples)
  }

  // ---- GIF (89a, LZW) — from the published spec (CompuServe GIF89a,
  // 1990; LZW per Welch 1984 with the GIF variable-code-size variant).
  // Paletted single-frame images; interlace and local color tables are
  // rejected with clear errors (the web-corpus fast path is the global-
  // table still frame).

  /** LSB-first bit writer packed into 255-byte sub-blocks. */
  private final class LzwBitSink {
    private val out = new scala.collection.mutable.ArrayBuffer[Byte]
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, size: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += size
      while (nbits >= 8) {
        out += (acc & 0xff).toByte
        acc >>>= 8; nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out += (acc & 0xff).toByte; nbits = 0 }
      out.toArray
    }
  }

  /** Encode a paletted frame as GIF89a. `palette` is 3·nColors RGB bytes
    * (nColors a power of two, 2..256); `indices` row-major w·h entries.
    */
  def encodeGif(width: Int, height: Int, palette: Array[Byte],
                indices: Array[Byte]): Array[Byte] = {
    val nColors = palette.length / 3
    require(nColors >= 2 && (nColors & (nColors - 1)) == 0 && nColors <= 256,
      s"palette size must be a power of two in [2,256], got $nColors")
    require(indices.length == width * height, "indices must be w*h")
    val bpp = 32 - Integer.numberOfLeadingZeros(nColors - 1) // log2
    val minCode = math.max(2, bpp)
    val clear = 1 << minCode; val end = clear + 1
    val sink = new LzwBitSink
    var codeSize = minCode + 1
    var next = end + 1
    val dict = new java.util.HashMap[Long, Integer]()
    sink.put(clear, codeSize)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xff
      val key = cur.toLong << 8 | b
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        sink.put(cur, codeSize)
        if (next < 4096) {
          dict.put(key, next)
          next += 1
          // canonical (giflib/ImageIO) timing: widen only when the NEXT
          // emission could not fit, i.e. when next EXCEEDS 2^codeSize —
          // one step later than the naive == rule (the decoder's table
          // lags the encoder's by one entry, so == desyncs every stream
          // at the first width change)
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else { // dict full: reset
          sink.put(clear, codeSize)
          dict.clear(); codeSize = minCode + 1; next = end + 1
        }
        cur = b
      }
      i += 1
    }
    sink.put(cur, codeSize)
    sink.put(end, codeSize)
    val lzw = sink.finish()

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0x80 | (bpp - 1) << 4 | (bpp - 1)) // GCT present, size 2^bpp
    out.write(0); out.write(0)                    // bg index, aspect
    out.write(palette)
    out.write(0x2c)                               // image descriptor
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(width)); out.write(le16(height))
    out.write(0)                                  // no LCT, not interlaced
    out.write(minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode a (single-frame, non-interlaced) GIF to RGB. Extensions are
    * skipped; local color tables override the global one per the spec.
    */
  def decodeGif(bytes: Array[Byte]): Image = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 3, "US-ASCII") == "GIF", "not a GIF file")
    val w0 = readLe16(bytes, 6); val h0 = readLe16(bytes, 8)
    var off = 10
    val packed = bytes(off) & 0xff
    off += 3 // packed + bg + aspect
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
      off += 3 * n
    }
    while (true) {
      require(off < bytes.length, "truncated GIF: no trailer")
      (bytes(off) & 0xff) match {
        case 0x21 => // extension: label then sub-blocks
          off += 2
          require(off < bytes.length, "truncated extension")
          while ((bytes(off) & 0xff) != 0) {
            off += 1 + (bytes(off) & 0xff)
            require(off < bytes.length, "truncated extension sub-block")
          }
          off += 1
        case 0x3b => throw new IllegalArgumentException("GIF has no image data")
        case 0x2c =>
          require(off + 10 <= bytes.length, "truncated image descriptor")
          val iw = readLe16(bytes, off + 5); val ih = readLe16(bytes, off + 7)
          val ip = bytes(off + 9) & 0xff
          val interlaced = (ip & 0x40) != 0
          off += 10
          var table = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            require(off + 3 * n <= bytes.length, "truncated local color table")
            table = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
            off += 3 * n
          }
          require(table != null, "GIF image with no color table")
          require(off < bytes.length, "truncated before LZW min code")
          val minCode = bytes(off) & 0xff
          require(minCode >= 2 && minCode <= 11, s"bad LZW min code $minCode")
          off += 1
          val data = new java.io.ByteArrayOutputStream()
          var more = true
          while (more) {
            require(off < bytes.length, "truncated sub-block length")
            val n = bytes(off) & 0xff
            if (n == 0) { more = false; off += 1 }
            else {
              require(off + 1 + n <= bytes.length, "truncated sub-block")
              data.write(bytes, off + 1, n)
              off += 1 + n
            }
          }
          val lzw = data.toByteArray
          val raw = lzwDecode(lzw, minCode, iw * ih)
          // interlace (GIF89a appendix E): rows arrive in four passes
          val idx = if (!interlaced) raw else {
            val o = new Array[Byte](iw * ih)
            var src = 0
            for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
              var row = start
              while (row < ih) {
                System.arraycopy(raw, src * iw, o, row * iw, iw)
                src += 1; row += step
              }
            }
            o
          }
          val px = new Array[Byte](iw * ih * 3)
          var i = 0
          while (i < iw * ih) {
            val c = (idx(i) & 0xff) * 3
            require(c + 2 < table.length, s"palette index ${idx(i) & 0xff} out of range")
            px(3 * i) = table(c); px(3 * i + 1) = table(c + 1)
            px(3 * i + 2) = table(c + 2)
            i += 1
          }
          // spec allows frames smaller than the logical screen; callers
          // get the frame raster (w0/h0 only matter for composition)
          val _ = (w0, h0)
          return Image(iw, ih, 3, px)
        case other =>
          throw new IllegalArgumentException(f"unexpected GIF block 0x$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** GIF-variant LZW: variable code size from minCode+1 to 12 bits,
    * LSB-first, clear/end codes, KwKwK case, deferred-clear tolerant.
    *
    * Code-size timing: the decoder's dictionary lags the encoder's by
    * one entry (the encoder defines an entry as it EMITS a code, the
    * decoder only when it has read the NEXT one), so sizing must track a
    * separate per-read counter `sizeNext` — the giflib RunningCode
    * device — not the entry count, or every stream desynchronizes at the
    * first width change.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expect)
    var outLen = 0
    var codeSize = minCode + 1
    var next = end + 1     // actual entries defined
    var sizeNext = end + 1 // encoder-mirrored counter driving codeSize
    var prev = -1
    var acc = 0L; var nbits = 0; var pos = 0
    while (outLen < expect) {
      while (nbits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits
        nbits += 8; pos += 1
      }
      require(nbits >= codeSize, "truncated LZW stream")
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; nbits -= codeSize
      if (code == clear) {
        codeSize = minCode + 1; next = end + 1; sizeNext = end + 1; prev = -1
      } else if (code == end) {
        require(outLen == expect, s"LZW ended early: $outLen of $expect")
      } else {
        require(code < clear || code > end, "reserved LZW code in stream")
        require(code < next || (code == next && prev >= 0),
          s"LZW code $code out of range (next=$next)")
        var sp = 0
        var c = code
        if (code == next) { // KwKwK: prev + first(prev)
          c = prev
          stack(sp) = 0; sp += 1 // placeholder, patched below
        }
        while (c >= end + 1) { // expand via the chain (literals < clear)
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        val first = c.toByte // literal head
        stack(sp) = first; sp += 1
        if (code == next) stack(0) = first // the KwKwK trailing byte
        var k = sp - 1
        while (k >= 0) {
          require(outLen < expect, "LZW produced too many pixels")
          out(outLen) = stack(k); outLen += 1
          k -= 1
        }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
        }
        sizeNext += 1
        if (sizeNext > (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    out
  }
}
