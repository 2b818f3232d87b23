package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("warc-spec").getOrCreate()

  test("encode/parse round trip: one record, bytes and recLen exact") {
    val payload = "hello \r\n world — ü".getBytes("UTF-8")
    val rec = Warc.encode("response", "https://host1.example/42",
      "2024-01-01T00:00:42Z", "urn:sha1:abc", payload)
    val parsed = Warc.parse(rec)
    assert(parsed.length == 1)
    val r = parsed.head
    assert(r.warcType == "response")
    assert(r.targetUri == "https://host1.example/42")
    assert(r.date == "2024-01-01T00:00:42Z")
    assert(r.recordId == "urn:sha1:abc")
    assert(r.payload.sameElements(payload))
    assert(r.recLen == rec.length)
  }

  test("multi-record blob parses in order; CRLF padding tolerated") {
    val r1 = Warc.encode("response", "u1", "2024-01-01T00:00:00Z", "id1",
      Array[Byte](1, 2, 3))
    val pad = "\r\n".getBytes("UTF-8")
    val r2 = Warc.encode("request", "u2", "2024-01-01T00:00:01Z", "id2",
      Array.empty[Byte])
    val parsed = Warc.parse(r1 ++ pad ++ pad ++ r2)
    assert(parsed.map(_.targetUri) == Seq("u1", "u2"))
    assert(parsed(1).payload.isEmpty)
    assert(parsed(0).recLen == r1.length && parsed(1).recLen == r2.length)
  }

  test("strict: truncated payload, bad magic, missing length all raise") {
    val rec = Warc.encode("response", "u", "2024-01-01T00:00:00Z", "i",
      Array.fill[Byte](100)(7))
    intercept[IllegalArgumentException](Warc.parse(rec.dropRight(10)))
    intercept[IllegalArgumentException](Warc.parse("HTTP/1.1 200\r\n\r\n".getBytes("UTF-8")))
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" + "\r\n\r\n").getBytes("UTF-8")
    intercept[IllegalArgumentException](Warc.parse(noLen))
    // payload containing CRLFCRLF must NOT confuse the length-delimited scan
    val tricky = Warc.encode("response", "u", "2024-01-01T00:00:00Z", "i",
      "\r\n\r\nWARC/1.0\r\n\r\n".getBytes("UTF-8"))
    assert(Warc.parse(tricky).head.payload.length == 16)
  }

  test("recordCol equals JVM encode byte-for-byte; segment round trip at two parallelism levels") {
    import spark.implicits._
    val sha1Hex = (s: String) => java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val pages = (0L until 200L).map { i =>
      (i, s"https://host${i % 7}.example/$i", 1704067200L + i,
        s"text body $i with content".getBytes("UTF-8"))
    }.toDF("doc_id", "url", "warc_sec", "html")

    val colBytes = pages
      .select(col("doc_id"), Warc.recordCol(col("url"), col("warc_sec"), col("html")).as("rec"))
      .as[(Long, Array[Byte])].collect().toMap
    (0L until 200L by 37L).foreach { i =>
      val expected = Warc.encode("response", s"https://host${i % 7}.example/$i",
        java.time.Instant.ofEpochSecond(1704067200L + i).toString,
        "urn:sha1:" + sha1Hex(s"https://host${i % 7}.example/$i"),
        s"text body $i with content".getBytes("UTF-8"))
      assert(colBytes(i).sameElements(expected), s"doc $i record bytes differ")
    }

    def run(parts: Int): Seq[(Long, String, Int)] = {
      val segs = Warc.segmentTable(pages.repartition(parts), pmod(col("doc_id"), lit(8)))
      Warc.parseTable(segs, "seg_id", "blob")
        .select(col("seg_id"), col("target_uri"), col("rec_len"))
        .as[(Long, String, Int)].collect().toSeq.sorted
    }
    val a = run(1); val b = run(13)
    assert(a == b)
    assert(a.length == 200)
  }

  test("segment blob bytes are deterministic across parallelism (lineage checksum property)") {
    import spark.implicits._
    val pages = (0L until 64L).map(i =>
      (i, s"u$i", 1704067200L + i, Array.fill[Byte]((i % 5).toInt + 1)(i.toByte)))
      .toDF("doc_id", "url", "warc_sec", "html")
    def sums(parts: Int): Map[Long, String] =
      Warc.segmentTable(pages.repartition(parts), pmod(col("doc_id"), lit(4)))
        .select(col("seg_id"), md5(col("blob")).as("m"))
        .as[(Long, String)].collect().toMap
    assert(sums(1) == sums(16))
  }

  test("gzip members: offsets are exact CDX re-fetch points; strict trailers") {
    val payloads = (0 until 7).map(i =>
      (s"member $i payload " * (i + 1)).getBytes("UTF-8"))
    val members = payloads.map(Warc.gzipMember)
    val blob = members.reduce(_ ++ _)
    val got = Warc.gunzipMembers(blob)
    assert(got.map(_._2.toSeq) == payloads.map(_.toSeq))
    // offsets: re-slicing the blob AT the offset re-decodes that member
    // alone — the property a CDX index fetch relies on
    got.zipWithIndex.foreach { case ((off, data), i) =>
      val sliced = java.util.Arrays.copyOfRange(blob, off.toInt,
        off.toInt + members(i).length)
      assert(Warc.gunzipMembers(sliced).head._2.toSeq == data.toSeq, s"member $i")
    }
    // corruption in the deflate body -> CRC reject, never garbage out
    val bad = blob.clone(); bad(members(0).length / 2) = (bad(members(0).length / 2) ^ 0x40).toByte
    assertThrows[Exception](Warc.gunzipMembers(bad))
    // truncated trailer rejects
    assertThrows[Exception](Warc.gunzipMembers(blob.dropRight(3)))
  }

  test("gzip members: JDK GZIPOutputStream interop and optional header fields") {
    // interop: members written by the JDK's own gzip writer decode
    val data = "jdk interop payload".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    assert(Warc.gunzipMembers(bos.toByteArray).head._2.toSeq == data.toSeq)
    // FNAME + FEXTRA + FCOMMENT skipping: splice the optional fields into
    // one of our own members (RFC 1952 field order: FEXTRA, FNAME, FCOMMENT)
    val m = Warc.gzipMember(data)
    val extra = Array[Byte](3, 0, 'a', 'b', 'c') // XLEN=3 LE + 3 bytes
    val name = "file.warc".getBytes("UTF-8") :+ 0.toByte
    val comment = "c".getBytes("UTF-8") :+ 0.toByte
    val hdr = m.take(10).clone()
    hdr(3) = (hdr(3) | 4 | 8 | 16).toByte
    val spliced = hdr ++ extra ++ name ++ comment ++ m.drop(10)
    assert(Warc.gunzipMembers(spliced).head._2.toSeq == data.toSeq)
  }

  test("gz segment round trip parses every record with member offsets increasing") {
    import spark.implicits._
    val pages = (0L until 80L).map(i =>
      (i, s"https://h$i.example/$i", 1704067200L + i,
        s"<html>page $i</html>".getBytes("UTF-8")))
      .toDF("doc_id", "url", "warc_sec", "html")
    val segs = Warc.segmentTableGz(pages, pmod(col("doc_id"), lit(4)))
    val parsed = Warc.parseGzTable(segs, "seg_id", "blob")
      .select(col("seg_id"), col("member_offset"), col("target_uri"))
      .as[(Long, Long, String)].collect()
    assert(parsed.length == 80)
    parsed.groupBy(_._1).values.foreach { recs =>
      val offs = recs.map(_._2).sorted
      assert(offs.head == 0L && offs.distinct.length == offs.length,
        "member offsets must start at 0 and be unique per segment")
    }
    // gz and plain paths parse to identical record fields
    val plain = Warc.parseTable(
      Warc.segmentTable(pages, pmod(col("doc_id"), lit(4))), "seg_id", "blob")
      .select(col("target_uri"), col("rec_len")).as[(String, Int)].collect().sorted.toSeq
    val viaGz = Warc.parseGzTable(segs, "seg_id", "blob")
      .select(col("target_uri"), col("rec_len")).as[(String, Int)].collect().sorted.toSeq
    assert(plain == viaGz)
  }

  test("cdxTable coordinates re-fetch every record byte-identically") {
    import spark.implicits._
    val pages = (0L until 40L).map(i =>
      (i, s"https://h$i.example/$i", 1704067200L + i,
        s"<html>body $i ${"x" * (i % 13).toInt}</html>".getBytes("UTF-8")))
      .toDF("doc_id", "url", "warc_sec", "html")
    val segs = Warc.segmentTableGz(pages, pmod(col("doc_id"), lit(4)))
    val blobs = segs.select(col("seg_id"), col("blob"))
      .as[(Long, Array[Byte])].collect().toMap
    val cdx = Warc.cdxTable(segs)
      .select(col("target_uri"), col("seg_id"), col("member_offset"),
        col("member_len"), col("payload_md5"))
      .as[(String, Long, Long, Int, String)].collect()
    assert(cdx.length == 40)
    cdx.foreach { case (uri, seg, off, len, md5hex) =>
      val r = Warc.fetchRecord(blobs(seg), off, len)
      assert(r.targetUri == uri)
      val got = java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString
      assert(got == md5hex, s"digest mismatch for $uri")
    }
    // member_len is the exact compressed extent: offsets+lens tile each
    // segment blob with no gaps
    cdx.groupBy(_._2).foreach { case (seg, recs) =>
      val spans = recs.map(r => (r._3, r._4)).sortBy(_._1)
      var expect = 0L
      spans.foreach { case (off, len) =>
        assert(off == expect, s"gap before offset $off in seg $seg")
        expect = off + len
      }
      assert(expect == blobs(seg).length, s"trailing bytes in seg $seg")
    }
  }

  test("revisit planning: one response per digest, revisits refer back") {
    import spark.implicits._
    val rows = Seq(
      // digest A fetched three times (out of order ids), B once
      (3L, "https://h/a3", 30L, "AAAA"),
      (1L, "https://h/a1", 10L, "AAAA"),
      (2L, "https://h/a2", 20L, "AAAA"),
      (9L, "https://h/b", 5L, "BBBB"))
      .toDF("doc_id", "url", "warc_sec", "s")
      .select(col("doc_id"), col("url"), col("warc_sec"),
        encode(col("s"), "UTF-8").as("payload"))
    val got = Warc.revisitTable(rows)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(4), r.getString(5),
        r.getLong(6), r.getLong(7))))
      .toMap
    assert(got(1L) === (("response", "", 0L, 0L)))
    assert(got(2L) === (("revisit", "https://h/a1", 10L, 4L)))
    assert(got(3L) === (("revisit", "https://h/a1", 10L, 4L)))
    assert(got(9L) === (("response", "", 0L, 0L)))
    // storage accounting: revisits save exactly the duplicate bytes
    val saved = got.values.map(_._4).sum
    assert(saved === 8L)
  }

  test("revisit ties on warc_sec break on uri then doc_id, total order") {
    import spark.implicits._
    val rows = Seq(
      (5L, "https://h/z", 10L, "X"),
      (4L, "https://h/y", 10L, "X"))
      .toDF("doc_id", "url", "warc_sec", "s")
      .select(col("doc_id"), col("url"), col("warc_sec"),
        encode(col("s"), "UTF-8").as("payload"))
    val got = Warc.revisitTable(rows)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got(4L) === "response") // "https://h/y" < "https://h/z"
    assert(got(5L) === "revisit")
  }

  test("zstd members: frame offsets split exactly; reference-encoder frames interop") {
    // three records: two through our store-mode encoder, the middle one
    // through the REFERENCE encoder — a real .warc.zst mixes producers
    // and the parser must not care
    val recs = Seq(
      Warc.encode("response", "https://h.example/1", "2024-01-01T00:00:00Z",
        "<urn:uuid:1>", "payload one".getBytes("UTF-8")),
      Warc.encode("response", "https://h.example/2", "2024-01-01T00:00:01Z",
        "<urn:uuid:2>", ("x" * 5000).getBytes("UTF-8")),
      Warc.encode("response", "https://h.example/3", "2024-01-01T00:00:02Z",
        "<urn:uuid:3>", "tail".getBytes("UTF-8")))
    val frames = Seq(
      graft.ops.Zstd.zstdCompressStore(recs(0)),
      com.github.luben.zstd.Zstd.compress(recs(1), 3),
      graft.ops.Zstd.zstdCompressStore(recs(2)))
    val blob = frames.flatten.toArray
    val members = graft.ops.Zstd.decodeFrames(blob)
    assert(members.map(_._1) ==
      Seq(0L, frames(0).length.toLong, (frames(0).length + frames(1).length).toLong))
    assert(members.map(_._2.toSeq) == recs.map(_.toSeq))
    for ((off, bytes) <- members) {
      val r = Warc.parse(bytes)
      assert(r.length == 1 && r.head.warcType == "response", s"member at $off")
    }
  }
}
