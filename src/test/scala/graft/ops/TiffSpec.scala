package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** GeoTIFF codec: byte-exact round trips (pixels + geotransform), both
  * byte orders, ImageIO cross-validation in both directions, multi-strip
  * reads, and clean rejection of truncation/garbage.
  */
class TiffSpec extends AnyFunSuite {

  private def grayPixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 7 + 3) % 256).toByte)

  test("round trip: gray and RGB pixels plus geotransform, bit-exact") {
    val g = grayPixels(13, 9)
    val enc = Tiff.encode(13, 9, 1, g, 100.25, 60.5, 0.25, -0.25)
    val d = Tiff.decode(enc)
    assert((d.width, d.height, d.channels) === ((13, 9, 1)))
    assert(d.pixels.toSeq === g.toSeq)
    assert((d.originX, d.originY, d.pxW, d.pxH) === ((100.25, 60.5, 0.25, -0.25)))
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i * 11 % 256).toByte)
    val d2 = Tiff.decode(Tiff.encode(4, 3, 3, rgb, -10.0, 5.0, 1.5, -2.0))
    assert(d2.channels === 3 && d2.pixels.toSeq === rgb.toSeq)
    assert((d2.originX, d2.originY, d2.pxW, d2.pxH) === ((-10.0, 5.0, 1.5, -2.0)))
  }

  test("ImageIO reads our TIFF; we read ImageIO's TIFF (gray)") {
    val w = 16; val h = 11
    val g = grayPixels(w, h)
    // ours -> ImageIO
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Tiff.encode(w, h, 1, g, 0, 10, 1, -1)))
    assert(img != null, "ImageIO could not parse our TIFF")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRaster.getSample(x, y, 0) & 0xff) ===
        (g(y * w + x) & 0xff), s"($x,$y)")
    // ImageIO -> ours (explicit no-compression single strip)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, g(y * w + x) & 0xff)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    // ImageIO writes no geo tags: pixels must still decode, with the
    // identity transform
    val mine = Tiff.decode(bos.toByteArray)
    assert((mine.width, mine.height, mine.channels) === ((w, h, 1)))
    assert(mine.pixels.toSeq === g.toSeq)
    assert((mine.originX, mine.originY, mine.pxW, mine.pxH) ===
      ((0.0, 0.0, 1.0, -1.0)))
  }

  test("PackBits strips decode: ImageIO-written and hand-built runs") {
    // ImageIO writes PackBits when asked -> our decoder must read it
    val w = 21; val h = 7
    val g = Array.tabulate(w * h) { i =>
      if ((i / w) % 2 == 0) 40.toByte else ((i * 13) % 256).toByte // runs + noise
    }
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, g(y * w + x) & 0xff)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("PackBits")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val d = Tiff.decode(bos.toByteArray)
    assert(d.width === w && d.height === h)
    assert(d.pixels.toSeq === g.toSeq)
    // hand-built: literal(3) + repeat(4 x 9) + noop + literal(1) = 8 px
    val enc0 = Tiff.encode(8, 1, 1, new Array[Byte](8), 0, 1, 1, -1)
    // splice a PackBits strip: find the strip (last 8 bytes) and rewrite
    val body = Array[Byte](2, 1, 2, 3, -3, 9, -128, 0, 5)
    val spliced = enc0.dropRight(8) ++ body
    // patch Compression (tag 259) value and StripByteCounts (279)
    def patch(bytes: Array[Byte], tag: Int, v: Int): Unit = {
      val n = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
      (0 until n).foreach { i =>
        val e = 10 + i * 12
        val t = ((bytes(e + 1) & 0xff) << 8) | (bytes(e) & 0xff)
        if (t == tag) { bytes(e + 8) = (v & 0xff).toByte
          bytes(e + 9) = ((v >> 8) & 0xff).toByte }
      }
    }
    patch(spliced, 259, 32773)
    patch(spliced, 279, body.length)
    val d2 = Tiff.decode(spliced)
    assert(d2.pixels.toSeq ===
      Seq[Byte](1, 2, 3, 9, 9, 9, 9, 5))
  }

  test("LZW strips decode ImageIO-written files, incl. dictionary growth") {
    // big enough (and repetitive enough) to push the dictionary through
    // the 9->10->11-bit width changes — wrong early-change timing
    // desyncs immediately
    val w = 200; val h = 120
    val g = Array.tabulate(w * h) { i =>
      if (i % 3 == 0) 7.toByte else ((i / 7 * 31) % 256).toByte
    }
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, g(y * w + x) & 0xff)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val d = Tiff.decode(bos.toByteArray)
    assert(d.width === w && d.height === h)
    assert(d.pixels.toSeq === g.toSeq)
  }

  test("big-endian (MM) hand-built file decodes") {
    // 2x1 gray, pixel values 7 and 250, minimal MM layout
    def b16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def b32(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bDbl(d: Double) = {
      val bits = java.lang.Double.doubleToLongBits(d)
      (7 to 0 by -1).map(i => ((bits >>> (8 * i)) & 0xff).toByte).toArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('M', 'M')); out.write(b16(42)); out.write(b32(8))
    val nE = 10
    val ifdSize = 2 + nE * 12 + 4
    val scaleOff = 8 + ifdSize
    val tieOff = scaleOff + 24
    val stripOff = tieOff + 48
    out.write(b16(nE))
    def entry(tag: Int, tpe: Int, count: Int, value: Int, short: Boolean): Unit = {
      out.write(b16(tag)); out.write(b16(tpe)); out.write(b32(count))
      if (short) { out.write(b16(value)); out.write(b16(0)) } else out.write(b32(value))
    }
    entry(256, 3, 1, 2, short = true)
    entry(257, 3, 1, 1, short = true)
    entry(258, 3, 1, 8, short = true)
    entry(259, 3, 1, 1, short = true)
    entry(262, 3, 1, 1, short = true)
    entry(273, 4, 1, stripOff, short = false)
    entry(278, 3, 1, 1, short = true)
    entry(279, 4, 1, 2, short = false)
    entry(33550, 12, 3, scaleOff, short = false)
    entry(33922, 12, 6, tieOff, short = false)
    out.write(b32(0))
    out.write(bDbl(0.5)); out.write(bDbl(0.5)); out.write(bDbl(0.0))
    (0 until 3).foreach(_ => out.write(bDbl(0.0)))
    out.write(bDbl(12.0)); out.write(bDbl(34.0)); out.write(bDbl(0.0))
    out.write(Array[Byte](7, 250.toByte))
    val d = Tiff.decode(out.toByteArray)
    assert(d.width === 2 && d.height === 1 && d.channels === 1)
    assert((d.pixels(0) & 0xff, d.pixels(1) & 0xff) === ((7, 250)))
    assert((d.originX, d.originY, d.pxW, d.pxH) === ((12.0, 34.0, 0.5, -0.5)))
  }

  test("truncation and garbage reject cleanly") {
    val enc = Tiff.encode(8, 8, 1, grayPixels(8, 8), 0, 8, 1, -1)
    for (cut <- Seq(0, 2, 7, 10, 30, enc.length - 10, enc.length - 1)) {
      val e = intercept[Exception](Tiff.decode(enc.take(cut)))
      assert(e.isInstanceOf[IllegalArgumentException], s"cut $cut: $e")
    }
    intercept[IllegalArgumentException](
      Tiff.decode("not a tiff at all".getBytes))
    // bit-flip fuzz over the header/IFD region: reject or succeed, never
    // an uncontrolled error
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val m = enc.clone()
      val i = rnd.nextInt(math.min(m.length, 40))
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      try { Tiff.decode(m); () } catch {
        case _: IllegalArgumentException => ()
      }
    }
  }
}
