package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** GIF LZW codec: self round-trip (sized to force dictionary resets and
  * every code width), cross-validation against the JDK's ImageIO GIF
  * plugin in BOTH directions (our decoder on ImageIO bytes, ImageIO's
  * decoder on our bytes), and truncation/garbage fuzz.
  */
class GifSpec extends AnyFunSuite {

  private def palette(n: Int): Array[Byte] = {
    val p = new Array[Byte](3 * n)
    for (i <- 0 until n) {
      p(3 * i) = ((i * 37 + 11) % 256).toByte
      p(3 * i + 1) = ((i * 73 + 5) % 256).toByte
      p(3 * i + 2) = ((i * 151 + 99) % 256).toByte
    }
    p
  }

  private def indices(w: Int, h: Int, n: Int, seed: Int): Array[Byte] = {
    val a = new Array[Byte](w * h)
    var s = seed
    for (i <- 0 until w * h) {
      s = s * 1103515245 + 12345
      // mix of noise and runs so the dictionary both grows and repeats
      a(i) = (if ((i / 17) % 3 == 0) (i / 7) % n else (s >>> 16) % n match {
        case v if v < 0 => v + n
        case v => v
      }).toByte
    }
    a
  }

  test("round-trip: 128x128, 64 colors (forces dict reset + all widths)") {
    for (seed <- Seq(1, 7, 42)) {
      val idx = indices(128, 128, 64, seed)
      val pal = palette(64)
      val gif = Codecs.encodeGif(128, 128, pal, idx)
      val img = Codecs.decodeGif(gif)
      assert((img.width, img.height, img.channels) === ((128, 128, 3)))
      for (i <- 0 until 128 * 128) {
        val c = (idx(i) & 0xff) * 3
        assert(img.pixels(3 * i) === pal(c) && img.pixels(3 * i + 1) === pal(c + 1)
          && img.pixels(3 * i + 2) === pal(c + 2), s"pixel $i seed $seed")
      }
    }
  }

  test("round-trip: 2-color bilevel (minimum code size clamp)") {
    val idx = indices(40, 25, 2, 3)
    val gif = Codecs.encodeGif(40, 25, palette(2), idx)
    val img = Codecs.decodeGif(gif)
    val pal = palette(2)
    for (i <- 0 until 40 * 25)
      assert(img.pixels(3 * i) === pal((idx(i) & 0xff) * 3))
  }

  test("our decoder reads ImageIO-encoded GIFs exactly") {
    val w = 97; val h = 61; val n = 64
    val pal = palette(n)
    val idx = indices(w, h, n, 9)
    val icm = new java.awt.image.IndexColorModel(8, n,
      Array.tabulate(n)(i => pal(3 * i)), Array.tabulate(n)(i => pal(3 * i + 1)),
      Array.tabulate(n)(i => pal(3 * i + 2)))
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, idx(y * w + x) & 0xff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", baos))
    val img = Codecs.decodeGif(baos.toByteArray)
    assert((img.width, img.height) === ((w, h)))
    for (i <- 0 until w * h) {
      val c = (idx(i) & 0xff) * 3
      assert(img.pixels(3 * i) === pal(c) && img.pixels(3 * i + 1) === pal(c + 1)
        && img.pixels(3 * i + 2) === pal(c + 2), s"pixel $i vs ImageIO encoder")
    }
  }

  test("ImageIO reads our encoder's GIFs exactly") {
    val w = 83; val h = 59; val n = 32
    val pal = palette(n)
    val idx = indices(w, h, n, 13)
    val gif = Codecs.encodeGif(w, h, pal, idx)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(bi != null, "ImageIO could not parse our GIF")
    assert((bi.getWidth, bi.getHeight) === ((w, h)))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = bi.getRGB(x, y)
      val c = (idx(y * w + x) & 0xff) * 3
      assert(((rgb >> 16) & 0xff) === (pal(c) & 0xff), s"r($x,$y)")
      assert(((rgb >> 8) & 0xff) === (pal(c + 1) & 0xff), s"g($x,$y)")
      assert((rgb & 0xff) === (pal(c + 2) & 0xff), s"b($x,$y)")
    }
  }

  test("truncation and garbage reject cleanly, no hangs") {
    val gif = Codecs.encodeGif(32, 32, palette(16), indices(32, 32, 16, 5))
    for (cut <- Seq(3, 10, 13, 20, gif.length / 2, gif.length - 2)) {
      // either a clean reject, or (cut in trailing padding) a COMPLETE
      // decode — a silent partial raster is the only failure mode
      try {
        val img = Codecs.decodeGif(java.util.Arrays.copyOf(gif, cut))
        assert(img.pixels.length === 32 * 32 * 3, s"partial decode at cut $cut")
      } catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => ()
      }
    }
    val garbage = gif.clone()
    var i = 20
    while (i < garbage.length - 10) { garbage(i) = (garbage(i) ^ 0x5a).toByte; i += 7 }
    try {
      Codecs.decodeGif(garbage) // must terminate; wrong pixels acceptable
    } catch { case _: Exception => () }
  }
}
