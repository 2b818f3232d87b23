package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Snappy + LZ4 block codecs: self round-trip over adversarial payload
  * shapes, cross-validation in BOTH directions against the independent
  * reference implementations on the test classpath (org.xerial.snappy,
  * net.jpountz.lz4 — the same libraries Spark itself uses for parquet
  * pages and shuffle blocks), and truncation/garbage fuzz (strict
  * decoders must raise, never hang or over-read).
  */
class LzSpec extends AnyFunSuite {

  /** Deterministic corpus: the payload shapes that stress each element
    * kind — pure RLE runs (overlap copies), periodic text (short
    * offsets), noise (literal runs > 60), tiny inputs, empty, and a
    * long mixed web-page-ish document.
    */
  private def corpus: Seq[Array[Byte]] = {
    var s = 12345
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    val noise = Array.fill[Byte](4096)((rnd() % 256).toByte)
    val runs = Array.fill[Byte](5000)(0) ++ Array.fill[Byte](300)('a'.toByte)
    val period3 = (0 until 3000).map(i => ("abc" (i % 3)).toByte).toArray
    val html = (0 until 50).flatMap { i =>
      s"""<div class="row"><a href="https://host$i.example/path/$i">page $i</a></div>\n""".getBytes("UTF-8").toSeq
    }.toArray
    val longDoc = (0 until 200).flatMap { i =>
      (s"the quick brown fox $i jumps over the lazy dog " * 3).getBytes("UTF-8").toSeq
    }.toArray
    Seq(
      Array.empty[Byte],
      "z".getBytes("UTF-8"),
      "abcd".getBytes("UTF-8"),
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa".getBytes("UTF-8"),
      "abcabcabcabcabcabcabcabcabcabcabcabc".getBytes("UTF-8"),
      noise, runs, period3, html, longDoc,
      noise ++ runs ++ html // mixed: literal > 256 followed by copies
    )
  }

  test("snappy: self round-trip over the corpus") {
    for (b <- corpus) {
      val enc = Lz.snappyCompress(b)
      assert(Lz.snappyDecompress(enc).toSeq == b.toSeq, s"len=${b.length}")
    }
  }

  test("lz4: self round-trip over the corpus") {
    for (b <- corpus) {
      val enc = Lz.lz4Compress(b)
      assert(Lz.lz4Decompress(enc).toSeq == b.toSeq, s"len=${b.length}")
    }
  }

  test("snappy: our decoder reads the reference encoder's bytes") {
    for (b <- corpus if b.nonEmpty) {
      val ref = org.xerial.snappy.Snappy.compress(b)
      assert(Lz.snappyDecompress(ref).toSeq == b.toSeq, s"len=${b.length}")
    }
  }

  test("snappy: the reference decoder reads our bytes") {
    for (b <- corpus) {
      val enc = Lz.snappyCompress(b)
      assert(org.xerial.snappy.Snappy.uncompress(enc).toSeq == b.toSeq,
        s"len=${b.length}")
    }
  }

  test("lz4: our decoder reads the reference encoder's bytes") {
    val f = net.jpountz.lz4.LZ4Factory.safeInstance()
    for (b <- corpus) {
      val ref = f.fastCompressor().compress(b)
      assert(Lz.lz4Decompress(ref).toSeq == b.toSeq, s"len=${b.length}")
    }
  }

  test("lz4: the reference decoder reads our bytes") {
    val f = net.jpountz.lz4.LZ4Factory.safeInstance()
    for (b <- corpus) {
      val enc = Lz.lz4Compress(b)
      val out = f.safeDecompressor().decompress(enc, b.length)
      assert(out.toSeq == b.toSeq, s"len=${b.length}")
    }
  }

  test("lz4: high-compression reference bytes also decode (different encoder path)") {
    val f = net.jpountz.lz4.LZ4Factory.safeInstance()
    for (b <- corpus) {
      val ref = f.highCompressor().compress(b)
      assert(Lz.lz4Decompress(ref).toSeq == b.toSeq, s"len=${b.length}")
    }
  }

  test("snappy: truncation fuzz rejects cleanly at every cut point class") {
    val enc = Lz.snappyCompress(corpus.last)
    for (cut <- Seq(0, 1, 2, enc.length / 4, enc.length / 2, enc.length - 1)) {
      val t = enc.take(cut)
      val r = try { Lz.snappyDecompress(t); "ok" }
      catch { case _: IllegalArgumentException => "rejected" }
      assert(r == "rejected", s"cut=$cut must not decode")
    }
  }

  test("lz4: truncation fuzz rejects cleanly") {
    val enc = Lz.lz4Compress(corpus.last)
    for (cut <- Seq(0, 1, 2, enc.length / 4, enc.length / 2)) {
      val t = enc.take(cut)
      val r = try { Lz.lz4Decompress(t); "ok" }
      catch { case _: IllegalArgumentException => "rejected" }
      // a cut can land on a literal boundary and decode to a short prefix;
      // what it must never do is throw anything unchecked or hang
      assert(r == "rejected" || r == "ok")
    }
  }

  test("garbage fuzz: random bytes either reject or decode within bounds (never crash)") {
    var s = 99
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    for (trial <- 0 until 300) {
      val len = 1 + rnd() % 200
      val b = Array.fill[Byte](len)((rnd() % 256).toByte)
      try { Lz.snappyDecompress(b) } catch { case _: IllegalArgumentException => () }
      try { Lz.lz4Decompress(b) } catch { case _: IllegalArgumentException => () }
      assert(System.nanoTime() < deadline, "fuzz deadline exceeded")
    }
  }

  test("snappy: compresses the compressible (RLE run beats 10% of input)") {
    val runs = Array.fill[Byte](100000)('x'.toByte)
    val enc = Lz.snappyCompress(runs)
    assert(enc.length < runs.length / 10, s"got ${enc.length}")
    assert(Lz.snappyDecompress(enc).length == runs.length)
  }

  test("lz4: compresses the compressible") {
    val runs = Array.fill[Byte](100000)('x'.toByte)
    val enc = Lz.lz4Compress(runs)
    assert(enc.length < runs.length / 10, s"got ${enc.length}")
    assert(Lz.lz4Decompress(enc).length == runs.length)
  }
}
