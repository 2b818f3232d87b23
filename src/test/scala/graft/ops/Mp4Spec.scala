package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** ISO BMFF container walk roundtrip (graft.ops.Mp4). */
class Mp4Spec extends AnyFunSuite {

  test("encode/decode roundtrip: dims, timing, per-sample payload bytes") {
    val samples = (0 until 7).map(i => Array.tabulate[Byte](20 + i * 3)(j => (j * 3 + i).toByte))
    val bytes = Mp4.encode(1280, 720, 90000, 3000, samples)
    val m = Mp4.decode(bytes)
    assert(m.width == 1280 && m.height == 720)
    assert(m.timescale == 90000 && m.duration == 21000)
    assert(m.samples.length == 7)
    m.samples.zip(samples).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("unknown boxes are skipped; non-mp4 rejected") {
    val bytes = Mp4.encode(64, 64, 1000, 100, Seq(Array[Byte](1, 2, 3)))
    // prepend a free box after ftyp: splice at the ftyp boundary
    val ftypLen = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++ Array[Byte](9, 9, 9, 9)
    val spliced = bytes.take(ftypLen) ++ free ++ bytes.drop(ftypLen)
    // stco offset is now stale by 12 bytes — rebuild instead: decode the
    // ORIGINAL with a trailing unknown box (safe: offsets unchanged)
    val trailing = bytes ++ free
    val m = Mp4.decode(trailing)
    assert(m.samples.length == 1 && m.samples(0).sameElements(Array[Byte](1, 2, 3)))
    assert(spliced.length == bytes.length + 12) // splice built correctly
    intercept[IllegalArgumentException](Mp4.decode("RIFFxxxxAVI ".getBytes("US-ASCII")))
  }
}
