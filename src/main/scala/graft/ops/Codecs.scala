package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

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
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var filled = 0
    while (!inflater.finished() && filled < raw.length)
      filled += inflater.inflate(raw, filled, raw.length - filled)
    inflater.end()
    require(filled == raw.length, s"short inflate: $filled of ${raw.length}")

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
}
