package graft.ops

import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

/** RFC 1951/1950 decoder: cross-validation against the JDK Deflater
  * across compression levels and strategies (each exercises different
  * block types — stored, fixed, dynamic), the zlib wrapper with
  * Adler-32, multi-block streams, and truncation/garbage fuzz.
  */
class InflateSpec extends AnyFunSuite {

  private def corpus: Seq[Array[Byte]] = {
    var s = 424242
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    Seq(
      Array.empty[Byte],
      "a".getBytes("UTF-8"),
      "hello world hello world hello".getBytes("UTF-8"),
      Array.fill[Byte](10000)('x'.toByte), // long match chains
      Array.fill[Byte](5000)((rnd() % 256).toByte), // incompressible -> stored
      (0 until 300).flatMap(i =>
        s"<a href='https://h$i.example/$i'>p$i</a>\n".getBytes("UTF-8").toSeq).toArray,
      // > 32k so back-references cross the window bound
      (0 until 3000).flatMap(i =>
        s"line $i of the corpus with token${i % 17}\n".getBytes("UTF-8").toSeq).toArray)
  }

  private def deflate(b: Array[Byte], level: Int, strategy: Int,
                      raw: Boolean): Array[Byte] = {
    val d = new Deflater(level, raw)
    d.setStrategy(strategy)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  test("raw inflate reads Deflater output across levels and strategies") {
    for (b <- corpus;
         level <- Seq(0, 1, 6, 9); // 0 = stored blocks
         strategy <- Seq(Deflater.DEFAULT_STRATEGY, Deflater.FILTERED,
           Deflater.HUFFMAN_ONLY)) {
      val enc = deflate(b, level, strategy, raw = true)
      assert(Inflate.inflate(enc).toSeq == b.toSeq,
        s"len=${b.length} level=$level strategy=$strategy")
    }
  }

  test("zlib decompress verifies header and Adler-32") {
    for (b <- corpus; level <- Seq(1, 6, 9)) {
      val enc = deflate(b, level, Deflater.DEFAULT_STRATEGY, raw = false)
      assert(Inflate.zlibDecompress(enc).toSeq == b.toSeq, s"len=${b.length}")
    }
    // corrupt the Adler trailer -> must reject
    val enc = deflate(corpus(2), 6, Deflater.DEFAULT_STRATEGY, raw = false)
    enc(enc.length - 1) = (enc(enc.length - 1) ^ 0x5a).toByte
    intercept[IllegalArgumentException] { Inflate.zlibDecompress(enc) }
  }

  test("consumed-byte accounting is exact (trailer found at the right offset)") {
    // zlibDecompress only passes when inflate's consumed count lands the
    // 4-byte Adler trailer exactly; also check with trailing garbage
    val b = corpus(5)
    val enc = deflate(b, 6, Deflater.DEFAULT_STRATEGY, raw = false)
    val padded = enc ++ Array[Byte](99, 98, 97)
    assert(Inflate.zlibDecompress(padded).toSeq == b.toSeq)
  }

  test("truncation and garbage fuzz reject cleanly within a deadline") {
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    val enc = deflate(corpus(5), 6, Deflater.DEFAULT_STRATEGY, raw = true)
    for (cut <- Seq(0, 1, 2, enc.length / 4, enc.length / 2, enc.length - 1)) {
      try { Inflate.inflate(enc.take(cut)) }
      catch { case _: IllegalArgumentException => () }
      assert(System.nanoTime() < deadline)
    }
    var s = 7
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    for (_ <- 0 until 300) {
      val b = Array.fill[Byte](1 + rnd() % 300)((rnd() % 256).toByte)
      try { Inflate.inflate(b) }
      catch { case _: IllegalArgumentException => () }
      try { Inflate.zlibDecompress(b) }
      catch { case _: IllegalArgumentException => () }
      assert(System.nanoTime() < deadline)
    }
  }

  test("bit-flip fuzz never loops or crashes unchecked") {
    val enc = deflate(corpus(5), 6, Deflater.DEFAULT_STRATEGY, raw = true)
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    var s = 31337
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    for (_ <- 0 until 200) {
      val m = enc.clone()
      m(rnd() % m.length) = (m(rnd() % m.length) ^ (1 << (rnd() % 8))).toByte
      try { Inflate.inflate(m) }
      catch { case _: IllegalArgumentException => () }
      assert(System.nanoTime() < deadline)
    }
  }
}
