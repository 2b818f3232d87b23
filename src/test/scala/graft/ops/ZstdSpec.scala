package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Zstd frame decoder: cross-validation against the reference
  * implementation shipped with Spark (zstd-jni, test classpath only)
  * across compression levels — each level family exercises different
  * format surface (RLE/raw literals, Huffman 1/4-stream, predefined vs
  * FSE vs repeat sequence tables, repeat offsets, multi-block frames) —
  * plus the reference decoder reading our store-mode frames, and
  * truncation/garbage fuzz.
  */
class ZstdSpec extends AnyFunSuite {

  private def corpus: Seq[Array[Byte]] = {
    var s = 20260820
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    val noise = Array.fill[Byte](6000)((rnd() % 256).toByte)
    val runs = Array.fill[Byte](8000)('r'.toByte) ++
      Array.fill[Byte](50)((rnd() % 256).toByte) ++ Array.fill[Byte](4000)(0)
    val html = (0 until 400).flatMap(i =>
      s"""<div id="row$i"><a href="https://host${i % 37}.example/p/$i">page $i</a></div>\n"""
        .getBytes("UTF-8").toSeq).toArray
    val text = (0 until 500).flatMap(i =>
      (s"the quick brown fox $i jumps over the lazy dog token${i % 13} " * 2)
        .getBytes("UTF-8").toSeq).toArray
    // > 128 KiB: multi-block frames, window-crossing matches
    val big = (0 until 4000).flatMap(i =>
      s"record $i field_a=${i * 17} field_b=token${i % 101} tail${rnd() % 7}\n"
        .getBytes("UTF-8").toSeq).toArray
    Seq(
      Array.empty[Byte],
      "a".getBytes("UTF-8"),
      "abcabcabcabc".getBytes("UTF-8"),
      noise, runs, html, text, big)
  }

  test("our decoder reads the reference encoder across levels") {
    for (b <- corpus; level <- Seq(-5, 1, 3, 6, 9, 12, 19)) {
      val enc = com.github.luben.zstd.Zstd.compress(b, level)
      val got = Zstd.decompress(enc)
      assert(got.toSeq == b.toSeq, s"len=${b.length} level=$level")
    }
  }

  test("our decoder reads reference frames with content checksums") {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setChecksum(true)
      ctx.setLevel(3)
      for (b <- corpus if b.nonEmpty) {
        val enc = ctx.compress(b)
        assert(Zstd.decompress(enc).toSeq == b.toSeq, s"len=${b.length}")
      }
    } finally ctx.close()
  }

  test("the reference decoder reads our store-mode frames") {
    for (b <- corpus) {
      val enc = Zstd.zstdCompressStore(b)
      val got = com.github.luben.zstd.Zstd.decompress(enc, b.length)
      assert(got.toSeq == b.toSeq, s"len=${b.length}")
      // and so does ours
      assert(Zstd.decompress(enc).toSeq == b.toSeq, s"self len=${b.length}")
    }
  }

  test("store-mode frames use RLE blocks for runs") {
    val runs = Array.fill[Byte](50000)('x'.toByte)
    val enc = Zstd.zstdCompressStore(runs)
    assert(enc.length < 100, s"RLE path not taken: ${enc.length} bytes")
    assert(Zstd.decompress(enc).toSeq == runs.toSeq)
  }

  test("skippable frames are skipped") {
    val b = corpus(5)
    val enc = com.github.luben.zstd.Zstd.compress(b, 3)
    val skip = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 1, 2, 3, 4)
    assert(Zstd.decompress(skip ++ enc).toSeq == b.toSeq)
  }

  test("oversized skippable-frame sizes fail loud, never spin or overrun") {
    // size 0xFFFFFFF8 went negative as an Int: p moved BACKWARD and
    // decompress() spun forever before the Long-size fix
    val spin = Array[Byte](0x50, 0x2a, 0x4d, 0x18,
      0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    intercept[IllegalArgumentException] { Zstd.decompress(spin) }
    // size 0x80000010 overran the array with a raw AIOOBE
    val over = Array[Byte](0x50, 0x2a, 0x4d, 0x18,
      0x10, 0x00, 0x00, 0x80.toByte)
    intercept[IllegalArgumentException] { Zstd.decompress(over) }
    // a skippable frame whose (positive) size overruns the input
    val short = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 9, 0, 0, 0, 1, 2)
    intercept[IllegalArgumentException] { Zstd.decompress(short) }
  }

  test("store-mode RLE blocks cap regenerated size at 128 KiB") {
    // a >128 KiB single-byte run must chain capped RLE blocks (the
    // 21-bit size field silently truncated past 2^21, and reference
    // decoders reject any block regenerating > 128 KiB)
    val run = Array.fill[Byte](400000)('z'.toByte)
    val enc = Zstd.zstdCompressStore(run)
    val got = com.github.luben.zstd.Zstd.decompress(enc, run.length)
    assert(got.toSeq == run.toSeq)
    assert(Zstd.decompress(enc).toSeq == run.toSeq)
  }

  test("truncation and garbage fuzz reject cleanly within a deadline") {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    val enc = com.github.luben.zstd.Zstd.compress(corpus(5), 3)
    for (cut <- Seq(0, 1, 3, 5, enc.length / 4, enc.length / 2, enc.length - 1)) {
      try { Zstd.decompress(enc.take(cut)) }
      catch { case _: IllegalArgumentException => () }
      assert(System.nanoTime() < deadline)
    }
    var s = 99
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    for (_ <- 0 until 200) {
      val b = Array.fill[Byte](8 + rnd() % 300)((rnd() % 256).toByte)
      // valid magic + garbage body
      b(0) = 0x28; b(1) = 0xb5.toByte; b(2) = 0x2f; b(3) = 0xfd.toByte
      try { Zstd.decompress(b) }
      catch { case _: IllegalArgumentException => ()
              case _: ArrayIndexOutOfBoundsException =>
                fail("unchecked array access on garbage input") }
      assert(System.nanoTime() < deadline)
    }
  }

  test("bit-flip fuzz never loops or crashes unchecked") {
    val enc = com.github.luben.zstd.Zstd.compress(corpus(6), 9)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var s = 31337
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    for (_ <- 0 until 150) {
      val m = enc.clone()
      m(4 + rnd() % (m.length - 4)) = (m(4 + rnd() % (m.length - 4)) ^ (1 << (rnd() % 8))).toByte
      try { Zstd.decompress(m) }
      catch { case _: IllegalArgumentException => ()
              case _: ArrayIndexOutOfBoundsException =>
                fail("unchecked array access on corrupted input") }
      assert(System.nanoTime() < deadline)
    }
  }
}
