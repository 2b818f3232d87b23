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

  test("multi-chunk stsc expansion resolves samples across chunks") {
    // hand-build: 5 samples split as chunks of [2, 2, 1] with stsc runs
    // (1→2 samples/chunk, 3→1) — the standard run-length form
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, p: Array[Byte]) = be32(8 + p.length) ++ t.getBytes("US-ASCII") ++ p
    val samples = (0 until 5).map(i => Array.tabulate[Byte](4 + i)(j => (i * 10 + j).toByte))
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val mdat = box("mdat", samples.flatten.toArray)
    val base = ftyp.length + 8
    val chunkOffs = Seq(base, base + samples(0).length + samples(1).length,
      base + samples.take(4).map(_.length).sum)
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(5) ++
      samples.flatMap(s => be32(s.length)).toArray)
    val stsc = box("stsc", be32(0) ++ be32(2) ++
      be32(1) ++ be32(2) ++ be32(1) ++ // chunks 1-2: 2 samples each
      be32(3) ++ be32(1) ++ be32(1))   // chunk 3: 1 sample
    val stco = box("stco", be32(0) ++ be32(3) ++ chunkOffs.flatMap(be32).toArray)
    val stbl = box("stbl", stsz ++ stsc ++ stco)
    val moov = box("moov", box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(500)) ++ box("trak", box("mdia", box("minf", stbl))))
    val m = Mp4.decode(ftyp ++ mdat ++ moov)
    assert(m.samples.length == 5)
    m.samples.zip(samples).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want), want.toSeq.toString)
    }
    assert(m.timescale == 1000 && m.duration == 500)
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
