package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class CodecsSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      val p = i / ch; val c = i % ch
      (((p % w) * 7 + (p / w) * 13 + c * 41) % 256).toByte
    }

  test("PNG round-trips for every filter type and color type") {
    for (ch <- Seq(1, 3, 4); f <- 0 to 4) {
      val px = pattern(23, 17, ch) // odd sizes exercise stride math
      val bytes = Codecs.encodePng(23, 17, ch, px, filterType = f)
      val img = Codecs.decodePng(bytes)
      assert(img.width === 23 && img.height === 17 && img.channels === ch,
        s"dims for ch=$ch f=$f")
      assert(img.pixels.toSeq === px.toSeq, s"pixels for ch=$ch f=$f")
    }
  }

  test("PNG decoder rejects non-PNG bytes") {
    intercept[IllegalArgumentException] {
      Codecs.decodePng("not a png at all".getBytes)
    }
  }

  test("WAV PCM-16 round-trips, including negative samples") {
    val samples = Array.tabulate(1000)(i => (((i * 37) % 2001) - 1000).toShort)
    val bytes = Codecs.encodeWavPcm16(samples, 44100)
    val a = Codecs.decodeWavPcm16(bytes)
    assert(a.sampleRate === 44100)
    assert(a.samples.toSeq === samples.toSeq)
  }

  test("AVI container round-trips header metadata and frame payloads") {
    val frames = (0 until 5).map(i => Array.tabulate[Byte](10 + i)(j => (i * 31 + j).toByte))
    val bytes = Codecs.encodeAvi(320, 240, 40000, frames)
    val v = Codecs.decodeAvi(bytes)
    assert(v.width === 320 && v.height === 240)
    assert(v.usecPerFrame === 40000 && v.totalFrames === 5)
    assert(v.frames.length === 5)
    frames.zip(v.frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("WAV parser skips unknown chunks before data") {
    val samples = Array[Short](1, -2, 3)
    val base = Codecs.encodeWavPcm16(samples, 8000)
    // splice a fake ancillary chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "junk".getBytes
    val spliced = base.slice(0, fmtEnd) ++ junk ++ base.slice(fmtEnd, base.length)
    val a = Codecs.decodeWavPcm16(spliced)
    assert(a.samples.toSeq === samples.toSeq)
  }
}
