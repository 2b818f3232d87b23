package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** WARC/1.0 (ISO 28500) container codec — the on-disk format of the
  * Common-Crawl corpus the north-rule pages table models. From scratch,
  * byte-level, no library lineage.
  *
  * Writer side ([[recordCol]]) is a pure Catalyst column expression
  * (binary `concat` of header bytes + payload), so record synthesis at
  * 10^12 rows stays inside whole-stage codegen — no UDF, no extra pass
  * over the payload. Reader side ([[parse]]) is a strict byte scanner
  * (malformed input raises, per the Mp4 strictness adjudication in
  * ADVICE r3) used partition-batched via [[parseTable]], the same shape
  * as the PNG/JPEG/MP4 decoders in [[Multimodal]].
  *
  * Reference anchor: buteo treats rasters as opaque containers resolved
  * to typed arrays (`core_raster/core_raster_read.py`); WARC is the
  * web-text analog — an opaque container column resolved to typed
  * (uri, date, payload) rows.
  */
object Warc {

  final case class Record(warcType: String, targetUri: String, date: String,
                          recordId: String, payload: Array[Byte], recLen: Int)

  private val CRLF = "\r\n"

  /** Single-record encode (JVM side, for tests and blob assembly). Field
    * order matches [[recordCol]] byte-for-byte.
    */
  def encode(warcType: String, targetUri: String, dateIso: String,
             recordId: String, payload: Array[Byte]): Array[Byte] = {
    val head = header(warcType, targetUri, dateIso, recordId, payload.length)
    val h = head.getBytes("UTF-8")
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def header(warcType: String, targetUri: String, dateIso: String,
                     recordId: String, len: Int): String =
    s"WARC/1.0$CRLF" +
      s"WARC-Type: $warcType$CRLF" +
      s"WARC-Record-ID: <$recordId>$CRLF" +
      s"WARC-Date: $dateIso$CRLF" +
      s"WARC-Target-URI: $targetUri$CRLF" +
      s"Content-Length: $len$CRLF" + CRLF

  /** Codegen'd record synthesis: the exact bytes of [[encode]] as a
    * column expression over (uri, epoch-seconds, payload). The record id
    * is derived deterministically from the uri (sha1-urn, the Common
    * Crawl convention shape) so re-runs are byte-identical.
    */
  def recordCol(uri: Column, epochSec: Column, payload: Column): Column = {
    val date = dateCol(epochSec)
    val rid = concat(lit("urn:sha1:"),
      sha1(org.apache.spark.sql.functions.encode(uri, "UTF-8")))
    val head = concat(
      lit("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF + "WARC-Record-ID: <"),
      rid, lit(">" + CRLF + "WARC-Date: "), date,
      lit(CRLF + "WARC-Target-URI: "), uri,
      lit(CRLF + "Content-Length: "), length(payload).cast("string"),
      lit(CRLF + CRLF))
    concat(org.apache.spark.sql.functions.encode(head, "UTF-8"), payload,
      lit((CRLF + CRLF).getBytes("UTF-8")))
  }

  /** ISO-8601 Zulu date from epoch seconds (session tz is UTC in every
    * graft main; DuckDB mirror: strftime(make_timestamp(sec*1000000), ...)).
    */
  def dateCol(epochSec: Column): Column =
    date_format(to_timestamp(epochSec), "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Strict parse of a blob of one-or-more concatenated WARC records.
    * Accepts optional extra CRLF padding between records (writers vary);
    * anything else malformed raises with byte offsets.
    */
  def parse(blob: Array[Byte]): Seq[Record] = {
    val out = ArrayBuffer[Record]()
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < blob.length && !(blob(i) == '\r' && blob(i + 1) == '\n')) i += 1
      require(i + 1 < blob.length, s"unterminated header line at byte $from")
      i
    }
    while (pos < blob.length) {
      // tolerate inter-record CRLF padding
      if (pos + 1 < blob.length && blob(pos) == '\r' && blob(pos + 1) == '\n') {
        pos += 2
      } else {
        val recStart = pos
        val e0 = lineEnd(pos)
        val version = new String(blob, pos, e0 - pos, "UTF-8")
        require(version.startsWith("WARC/"), s"expected WARC/ magic at byte $pos, got '$version'")
        pos = e0 + 2
        var warcType = ""; var uri = ""; var date = ""; var rid = ""
        var contentLength = -1L
        var headersDone = false
        while (!headersDone) {
          val e = lineEnd(pos)
          if (e == pos) { headersDone = true; pos += 2 }
          else {
            val line = new String(blob, pos, e - pos, "UTF-8")
            val ci = line.indexOf(':')
            require(ci > 0, s"malformed header '$line' at byte $pos")
            val key = line.substring(0, ci).trim.toLowerCase
            val value = line.substring(ci + 1).trim
            key match {
              case "warc-type"       => warcType = value
              case "warc-target-uri" => uri = value
              case "warc-date"       => date = value
              case "warc-record-id"  => rid = value.stripPrefix("<").stripSuffix(">")
              case "content-length"  => contentLength = value.toLong
              case _                 => () // unknown headers are legal
            }
            pos = e + 2
          }
        }
        require(contentLength >= 0, "record missing Content-Length")
        require(pos + contentLength + 4 <= blob.length,
          s"payload of $contentLength bytes at $pos overruns blob of ${blob.length}")
        val payload = java.util.Arrays.copyOfRange(blob, pos, pos + contentLength.toInt)
        pos += contentLength.toInt
        require(blob(pos) == '\r' && blob(pos + 1) == '\n' &&
          blob(pos + 2) == '\r' && blob(pos + 3) == '\n',
          s"record at $pos missing CRLFCRLF trailer")
        pos += 4
        out += Record(warcType, uri, date, rid, payload, pos - recStart)
      }
    }
    out.toSeq
  }

  /** Assemble pages into multi-record WARC segment blobs — the write path.
    * One shuffle on the segment key; records within a segment are laid out
    * in doc_id order so segment bytes are deterministic at any parallelism
    * (the property that makes segment-level checksums usable as lineage).
    * Expects columns (doc_id, url, warc_sec, html).
    */
  def segmentTable(pages: DataFrame, segExpr: Column): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select(segExpr.cast("long").as("seg"), col("doc_id"),
        recordCol(col("url"), col("warc_sec"), col("html")).as("rec"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (seg, it) =>
        val recs = it.toArray.sortBy(_._2)
        val blob = new Array[Byte](recs.iterator.map(_._3.length).sum)
        var off = 0
        recs.foreach { case (_, _, r) =>
          System.arraycopy(r, 0, blob, off, r.length); off += r.length
        }
        (seg, blob)
      }
      .toDF("seg_id", "blob")
  }

  /** Partition-batched parse of a binary WARC-blob column: one input row
    * (a WARC segment holding k records) explodes to k typed rows. The
    * 100-TB shape: segments are the unit of parallelism (Common Crawl
    * ships ~1 GB segment files), records never cross segments, so the
    * scan is embarrassingly parallel with zero shuffle.
    */
  def parseTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (segId, blob) =>
          parse(blob).map(r =>
            (segId, r.warcType, r.targetUri, r.date, r.recordId, r.payload, r.recLen))
        }
      }
      .toDF("seg_id", "warc_type", "target_uri", "warc_date", "record_id",
        "payload", "rec_len")
  }

  // --- gzip member layer -------------------------------------------------
  // Common Crawl's on-disk convention: each WARC record is its OWN gzip
  // member and members are concatenated into the segment file (.warc.gz),
  // so any record can be fetched/inflated independently given its byte
  // offset — the offsets below are exactly what a CDX index carries.

  private def writeLe32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }
  private def le32u(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** One deterministic gzip member (mtime 0, no name/extra/comment, XFL 0,
    * OS 255) around `data` — byte-stable at any parallelism, so segment
    * checksums stay usable as lineage like the uncompressed path.
    */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
      true /* raw deflate — gzip wraps it itself */)
    d.setInput(data); d.finish()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(tmp); out.write(tmp, 0, n) }
    d.end()
    val crc = new java.util.zip.CRC32(); crc.update(data)
    writeLe32(out, crc.getValue)
    writeLe32(out, data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Decode concatenated gzip members → (memberByteOffset, bytes) per
    * member. Strict like the WARC scanner: header magic/method checked,
    * optional FEXTRA/FNAME/FCOMMENT/FHCRC fields skipped per RFC 1952,
    * CRC32 and ISIZE trailers VERIFIED — silent corruption rejects
    * instead of yielding garbage records.
    */
  def gunzipMembers(blob: Array[Byte]): Seq[(Long, Array[Byte])] =
    gunzipMembersWithLen(blob).map { case (off, _, data) => (off, data) }

  /** gunzipMembers plus the COMPRESSED length of each member — offset +
    * length is the complete CDX fetch coordinate (range-GET the slice,
    * inflate it alone).
    */
  def gunzipMembersWithLen(blob: Array[Byte]): Seq[(Long, Int, Array[Byte])] = {
    val out = ArrayBuffer[(Long, Int, Array[Byte])]()
    var pos = 0
    while (pos < blob.length) {
      val start = pos
      require(pos + 10 <= blob.length &&
        (blob(pos) & 0xff) == 0x1f && (blob(pos + 1) & 0xff) == 0x8b,
        s"not a gzip member at byte $pos")
      require(blob(pos + 2) == 8, s"unsupported gzip method ${blob(pos + 2)} at $pos")
      val flg = blob(pos + 3) & 0xff
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA
        require(pos + 2 <= blob.length, s"truncated FEXTRA length at member $start")
        val xlen = ((blob(pos) & 0xff) | ((blob(pos + 1) & 0xff) << 8))
        pos += 2 + xlen
        require(pos <= blob.length, s"FEXTRA overruns blob in member at $start")
      }
      def skipNulTerminated(field: String): Unit = {
        while (pos < blob.length && blob(pos) != 0) pos += 1
        require(pos < blob.length, s"unterminated $field in member at $start")
        pos += 1
      }
      if ((flg & 8) != 0) skipNulTerminated("FNAME")
      if ((flg & 16) != 0) skipNulTerminated("FCOMMENT")
      if ((flg & 2) != 0) { // FHCRC
        pos += 2
        require(pos <= blob.length, s"truncated FHCRC in member at $start")
      }
      // from-scratch RFC 1951 decoder (Inflate.scala); java.util.zip
      // remains the encode side and the test-time cross-check only
      val (data, used) =
        try Inflate.inflate(blob, pos)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"truncated/invalid deflate stream at member $start: ${e.getMessage}")
        }
      pos += used
      require(pos + 8 <= blob.length, s"member at $start missing CRC/ISIZE trailer")
      val crc = new java.util.zip.CRC32(); crc.update(data)
      require(le32u(blob, pos) == crc.getValue,
        s"gzip CRC mismatch in member at byte $start")
      require(le32u(blob, pos + 4) == (data.length.toLong & 0xffffffffL),
        s"gzip ISIZE mismatch in member at byte $start")
      pos += 8
      out += ((start.toLong, pos - start, data))
    }
    out.toSeq
  }

  /** Random-access record fetch: inflate and parse the single member at
    * (offset, length) — the CDX consumer path (range-GET the slice, never
    * touch the rest of the segment).
    */
  def fetchRecord(blob: Array[Byte], offset: Long, length: Int): Record = {
    val slice = java.util.Arrays.copyOfRange(blob, offset.toInt, offset.toInt + length)
    val members = gunzipMembers(slice)
    require(members.length == 1, s"expected one member in slice, got ${members.length}")
    val recs = parse(members.head._2)
    require(recs.length == 1, s"expected one record in member, got ${recs.length}")
    recs.head
  }

  /** CDX-style index over .warc.gz segments: one row per record with its
    * exact fetch coordinate (seg_id, member_offset, member_len) plus the
    * payload digest — what Common Crawl publishes as cc-index. Built by
    * the same zero-shuffle member scan as parseGzTable.
    */
  /** Lowercase-hex MD5 of `data` using a caller-held digest (reset per
    * call) — hoist ONE MessageDigest per partition instead of paying the
    * JCE provider lookup per record.
    */
  /** Revisit-record planning — the WARC-level dedup Common Crawl applies
    * at ingestion (ISO 28500 §6.7: a fetch whose payload digest was
    * already stored becomes a `revisit` record referencing the original
    * instead of re-storing the body; in CC's crawls this routinely saves
    * a third of raw storage). For each fetch: its payload digest, whether
    * it is the canonical `response` (the FIRST fetch of that digest in
    * (warc_sec, uri, doc_id) order — a total order, so the plan is
    * parallelism-independent) or a `revisit`, the original it refers to,
    * and the payload bytes the revisit saves.
    *
    * Scale shape: ONE shuffle on the digest + a per-digest window whose
    * partitions are duplicate groups (bounded by refetch behavior, not
    * corpus size); `first_value` under the default running frame reads
    * the group head without a second join.
    */
  def revisitTable(pages: DataFrame, uriCol: String = "url",
                   secCol: String = "warc_sec",
                   payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("digest")
      .orderBy(col(secCol), col(uriCol), col("doc_id"))
    pages
      .withColumn("digest", md5(col(payloadCol)))
      .withColumn("rn", row_number().over(w))
      .withColumn("orig_uri", first_value(col(uriCol)).over(w))
      .withColumn("orig_sec", first_value(col(secCol)).over(w))
      .select(col("doc_id"), col(uriCol).as("uri"), col(secCol).as("sec"),
        col("digest"),
        when(col("rn") === 1, "response").otherwise("revisit").as("warc_type"),
        when(col("rn") === 1, "").otherwise(col("orig_uri")).as("refers_to_uri"),
        when(col("rn") === 1, lit(0L))
          .otherwise(col("orig_sec").cast("long")).as("refers_to_sec"),
        when(col("rn") === 1, lit(0L))
          .otherwise(length(col(payloadCol)).cast("long")).as("saved_bytes"))
  }

  def md5Hex(md: java.security.MessageDigest, data: Array[Byte]): String = {
    md.reset()
    md.digest(data).map("%02x".format(_)).mkString
  }

  def cdxTable(segs: DataFrame, idCol: String = "seg_id",
               binCol: String = "blob"): DataFrame = {
    val spark = segs.sparkSession
    import spark.implicits._
    segs.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (segId, blob) =>
          gunzipMembersWithLen(blob).flatMap { case (off, len, bytes) =>
            parse(bytes).map(r =>
              (r.targetUri, segId, off, len, r.date, md5Hex(md, r.payload)))
          }
        }
      }
      .toDF("target_uri", "seg_id", "member_offset", "member_len",
        "warc_date", "payload_md5")
  }

  /** segmentTable with the member-per-record convention: each record is
    * gzip'd independently, members concatenated in doc_id order. Same
    * single shuffle; compression is map-side work inside the group.
    */
  def segmentTableGz(pages: DataFrame, segExpr: Column): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select(segExpr.cast("long").as("seg"), col("doc_id"),
        recordCol(col("url"), col("warc_sec"), col("html")).as("rec"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (seg, it) =>
        val recs = it.toArray.sortBy(_._2)
        val members = recs.map(r => gzipMember(r._3))
        val blob = new Array[Byte](members.iterator.map(_.length).sum)
        var off = 0
        members.foreach { m =>
          System.arraycopy(m, 0, blob, off, m.length); off += m.length
        }
        (seg, blob)
      }
      .toDF("seg_id", "blob")
  }

  /** parseTable over .warc.gz-style segments: split members, inflate each
    * independently, parse the record inside; `member_offset` is the
    * CDX-style fetch offset. Zero shuffle, like the uncompressed path.
    */
  /** One zstd frame per record, frames concatenated per segment — the
    * `.warc.zst` convention (record-per-frame keeps CDX-style random
    * access: any record inflates alone given its frame offset). Frames
    * come from the spec-valid store-mode encoder; [[parseZstdTable]]
    * reads them back through the from-scratch RFC 8878 decoder, so any
    * real `.warc.zst` (reference-encoder frames included, per ZstdSpec)
    * parses identically.
    */
  def segmentTableZstd(pages: DataFrame, segExpr: Column): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select(segExpr.cast("long").as("seg"), col("doc_id"),
        recordCol(col("url"), col("warc_sec"), col("html")).as("rec"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (seg, it) =>
        val recs = it.toArray.sortBy(_._2)
        val members = recs.map(r => Zstd.zstdCompressStore(r._3))
        val blob = new Array[Byte](members.iterator.map(_.length).sum)
        var off = 0
        members.foreach { m =>
          System.arraycopy(m, 0, blob, off, m.length); off += m.length
        }
        (seg, blob)
      }
      .toDF("seg_id", "blob")
  }

  /** parseTable over `.warc.zst`-style segments: split frames, decode
    * each with the from-scratch zstd decoder, parse the record inside.
    */
  def parseZstdTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (segId, blob) =>
          Zstd.decodeFrames(blob).flatMap { case (memOff, bytes) =>
            parse(bytes).map(r =>
              (segId, memOff, r.warcType, r.targetUri, r.date, r.recordId,
                r.payload, r.recLen))
          }
        }
      }
      .toDF("seg_id", "member_offset", "warc_type", "target_uri", "warc_date",
        "record_id", "payload", "rec_len")
  }

  def parseGzTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (segId, blob) =>
          gunzipMembers(blob).flatMap { case (memOff, bytes) =>
            parse(bytes).map(r =>
              (segId, memOff, r.warcType, r.targetUri, r.date, r.recordId,
                r.payload, r.recLen))
          }
        }
      }
      .toDF("seg_id", "member_offset", "warc_type", "target_uri", "warc_date",
        "record_id", "payload", "rec_len")
  }
}
