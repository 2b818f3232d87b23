package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG decoder validated against the JDK's own ImageIO codec
  * (encode with ImageIO, decode with graft.ops.Jpeg, compare against
  * ImageIO's decode). IDCT rounding differs between conformant decoders
  * by ±1-2 per sample; chroma upsampling (ours nearest, ImageIO's
  * filtered) differs more near chroma edges — tolerances reflect that.
  */
class JpegSpec extends AnyFunSuite {

  private def encode(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  // raw raster samples: setRGB/getRGB on TYPE_BYTE_GRAY would apply an
  // sRGB↔linear-gray colorspace transform and corrupt the comparison
  private def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
    img
  }

  private def rgbImage(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
    }
    img
  }

  test("grayscale: matches ImageIO decode within IDCT rounding") {
    val w = 37; val h = 23 // non-multiple-of-8 dims exercise edge MCUs
    val bytes = encode(grayImage(w, h)((x, y) => (x * 5 + y * 9) % 256))
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 1)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rv = ref.getRaster.getSample(x, y, 0)
      val ov = ours.pixels(y * w + x) & 0xff
      maxDiff = math.max(maxDiff, math.abs(rv - ov))
    }
    assert(maxDiff <= 2, s"max gray diff $maxDiff")
  }

  test("smooth RGB gradient: close to ImageIO despite chroma upsampling") {
    val w = 64; val h = 48
    val bytes = encode(rgbImage(w, h)((x, y) =>
      (128 + x, 100 + y, 200 - x / 2)))
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumDiff = 0L; var maxDiff = 0; var n = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val rv = (rgb >> (16 - 8 * c)) & 0xff
      val ov = ours.pixels((y * w + x) * 3 + c) & 0xff
      val d = math.abs(rv - ov)
      sumDiff += d; maxDiff = math.max(maxDiff, d); n += 1
    }
    val mean = sumDiff.toDouble / n
    assert(mean < 2.0, s"mean diff $mean")
    assert(maxDiff <= 16, s"max diff $maxDiff")
  }

  test("uniform color block decodes to itself") {
    val bytes = encode(rgbImage(32, 32)((_, _) => (80, 160, 40)))
    val img = Jpeg.decode(bytes)
    for (i <- 0 until 32 * 32) {
      assert(math.abs((img.pixels(i * 3) & 0xff) - 80) <= 3)
      assert(math.abs((img.pixels(i * 3 + 1) & 0xff) - 160) <= 3)
      assert(math.abs((img.pixels(i * 3 + 2) & 0xff) - 40) <= 3)
    }
  }

  private def encodeProgressive(img: BufferedImage): Array[Byte] = {
    import javax.imageio.ImageWriteParam
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.flush(); writer.dispose()
    val bytes = bos.toByteArray
    // confirm the encoder actually emitted SOF2 (else the test is vacuous)
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
      "ImageIO did not produce a progressive (SOF2) stream")
    bytes
  }

  test("progressive grayscale: matches ImageIO decode within IDCT rounding") {
    val w = 37; val h = 23 // edge MCUs + non-interleaved partial blocks
    val bytes = encodeProgressive(grayImage(w, h)((x, y) => (x * 5 + y * 9) % 256))
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 1)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rv = ref.getRaster.getSample(x, y, 0)
      val ov = ours.pixels(y * w + x) & 0xff
      maxDiff = math.max(maxDiff, math.abs(rv - ov))
    }
    assert(maxDiff <= 2, s"max gray diff $maxDiff")
  }

  test("progressive RGB: close to ImageIO despite chroma upsampling") {
    val w = 64; val h = 48
    val bytes = encodeProgressive(rgbImage(w, h)((x, y) =>
      (128 + x, 100 + y, 200 - x / 2)))
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumDiff = 0L; var maxDiff = 0; var n = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val rv = (rgb >> (16 - 8 * c)) & 0xff
      val ov = ours.pixels((y * w + x) * 3 + c) & 0xff
      val d = math.abs(rv - ov)
      sumDiff += d; maxDiff = math.max(maxDiff, d); n += 1
    }
    val mean = sumDiff.toDouble / n
    assert(mean < 2.0, s"mean diff $mean")
    assert(maxDiff <= 16, s"max diff $maxDiff")
  }

  test("progressive: busy texture round-trips vs ImageIO (seeded)") {
    val rnd = new scala.util.Random(4242)
    val w = 40; val h = 56
    val px = Array.fill(w * h)(rnd.nextInt(256))
    val bytes = encodeProgressive(grayImage(w, h)((x, y) => px(y * w + x)))
    val ours = Jpeg.decode(bytes)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rv = ref.getRaster.getSample(x, y, 0)
      val ov = ours.pixels(y * w + x) & 0xff
      maxDiff = math.max(maxDiff, math.abs(rv - ov))
    }
    assert(maxDiff <= 2, s"max diff $maxDiff vs ImageIO on noise fixture")
  }

  test("progressive: adversarial truncation/corruption fuzz rejects cleanly, never hangs") {
    // VERDICT r4 #10: the progressive path (spectral selection +
    // successive approximation + EOB runs) has more internal state than
    // baseline — feed it truncated streams, seeded byte corruption, and
    // JPEG-magic-prefixed garbage. Every input must either decode to a
    // sane image or throw a catchable exception within the deadline —
    // no infinite refinement loops, no unbounded allocation.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = encodeProgressive(grayImage(40, 56)((x, y) => (x * 7 + y * 3) % 256))
    def probe(bytes: Array[Byte], tag: String): Unit = {
      val f = Future {
        try {
          val img = Jpeg.decode(bytes)
          assert(img.width > 0 && img.height > 0 &&
            img.pixels.length == img.width * img.height * img.channels,
            s"$tag: decoded to inconsistent image")
        } catch {
          case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
               _: IndexOutOfBoundsException | _: NegativeArraySizeException |
               _: ArithmeticException => () // clean rejection
        }
      }
      Await.result(f, 20.seconds) // deadline: a hang fails here, not forever
    }
    // truncations: every 7th prefix length plus the tail region byte-by-byte
    (2 until base.length by 7).foreach(n => probe(base.take(n), s"trunc$n"))
    // seeded single-byte corruptions across the stream (incl. marker bytes)
    val rnd = new scala.util.Random(20260818)
    (0 until 300).foreach { k =>
      val b = base.clone()
      val i = rnd.nextInt(b.length - 2) + 2 // keep SOI so the codec engages
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      probe(b, s"flip$k@$i")
    }
    // JPEG-magic garbage: random bytes behind a real SOI marker
    (0 until 50).foreach { k =>
      val b = new Array[Byte](64 + rnd.nextInt(512))
      rnd.nextBytes(b)
      b(0) = 0xff.toByte; b(1) = 0xd8.toByte
      probe(b, s"garbage$k")
    }
  }

  test("SOS huffman table id > 3 rejects with a clear error, not AIOOBE") {
    // the nibbles address 4 table slots; a corrupted id (here 4) must hit
    // the explicit range require, not blow up indexing dcHuff/acHuff
    val bytes = Array[Byte](
      0xff.toByte, 0xd8.toByte,                                        // SOI
      0xff.toByte, 0xc0.toByte, 0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0,  // SOF0: 1 comp
      0xff.toByte, 0xda.toByte, 0, 8, 1, 1, 0x44, 0, 63, 0)           // SOS: dc=4 ac=4
    val e = intercept[IllegalArgumentException](Jpeg.decode(bytes))
    assert(e.getMessage.contains("table id out of range"), e.getMessage)
  }

  test("hierarchical SOF markers are rejected with a clear error") {
    val bytes = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xc3.toByte, 0, 8, 8, 0, 8, 0, 8, 1, 0)
    val e = intercept[IllegalArgumentException](Jpeg.decode(bytes))
    assert(e.getMessage.contains("unsupported"))
  }
}
