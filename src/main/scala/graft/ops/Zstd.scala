package graft.ops

import java.util.Arrays

/** From-scratch Zstandard frame decoder (RFC 8878) — the codec under
  * Common-Crawl's columnar index and the modern lakehouse's coldest
  * tier. Implemented byte/bit-level from the RFC only: frame header,
  * raw/RLE/compressed blocks, FSE (table description read-forward,
  * decode read-backward), Huffman-coded literals (direct and
  * FSE-compressed weight descriptions, 1-stream and 4-stream), and the
  * sequences section with the three predefined distributions, RLE and
  * FSE table modes, table repeat, and the full repeat-offset history
  * rules. The companion encoder [[zstdCompressStore]] emits spec-valid
  * store-mode frames (raw + RLE blocks) for fixtures; real compressed
  * frames are cross-validated in ZstdSpec in BOTH directions where
  * possible (our decoder on zstd-jni output across levels; zstd-jni on
  * our store frames).
  *
  * Strict decode (malformed input raises IllegalArgumentException, the
  * Warc/Mp4 adjudication). Content checksum bytes are consumed but not
  * verified (xxhash64 of the frame content is an environment pin;
  * decode correctness is pinned by the cross-validation instead) —
  * documented contract. Dictionaries are not supported and fail loudly.
  */
object Zstd {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"zstd: $msg")

  // ------------------------------------------------------------ bit reader

  /** Backward bitstream (RFC 8878 §3.1.1.3.2): bytes are read from the
    * end toward `from`; the last byte carries a 1-bit end marker above
    * the payload bits. Over-reads beyond the start are permitted (they
    * deliver zero bits) but flagged — FSE weight decoding stops on it.
    */
  private final class BackBits(src: Array[Byte], from: Int, until: Int) {
    if (until <= from) fail("empty backward bitstream")
    private var bitsLeft: Int = {
      val last = src(until - 1) & 0xff
      if (last == 0) fail("backward bitstream missing end marker")
      (until - from - 1) * 8 + (31 - Integer.numberOfLeadingZeros(last))
    }
    var overflowed = false
    def read(n: Int): Int = {
      if (n == 0) return 0
      var v = 0L
      // bits are consumed MSB-side of the remaining payload
      var need = n
      var got = 0
      if (need > bitsLeft) { overflowed = true }
      val take = math.min(need, math.max(0, bitsLeft))
      // gather `take` bits ending at position bitsLeft-1 downward
      var i = 0
      while (i < take) {
        val bitPos = bitsLeft - 1 - i // absolute bit index from `from`
        val b = src(from + (bitPos >> 3)) & 0xff
        val bit = (b >>> (bitPos & 7)) & 1
        v = (v << 1) | bit
        i += 1
      }
      got = take
      bitsLeft -= take
      // over-read pads with zeros on the LOW side (as if the stream
      // continued with zero bits)
      (v << (need - got)).toInt
    }
    def remaining: Int = bitsLeft
  }

  // ------------------------------------------------------------------ FSE

  private final class FseTable(val accLog: Int, counts: Array[Int]) {
    val size = 1 << accLog
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
    locally {
      var highThreshold = size - 1
      // "less than 1" (-1) symbols take one cell each from the top
      for (s <- counts.indices if counts(s) == -1) {
        symbol(highThreshold) = s
        highThreshold -= 1
      }
      val step = (size >> 1) + (size >> 3) + 3
      var pos = 0
      for (s <- counts.indices if counts(s) > 0) {
        var i = 0
        while (i < counts(s)) {
          symbol(pos) = s
          pos = (pos + step) & (size - 1)
          while (pos > highThreshold) pos = (pos + step) & (size - 1)
          i += 1
        }
      }
      if (pos != 0) fail("FSE table spread did not return to zero")
      val next = new Array[Int](counts.length)
      for (s <- counts.indices)
        next(s) = if (counts(s) == -1) 1 else math.max(0, counts(s))
      for (u <- 0 until size) {
        val s = symbol(u)
        val x = next(s); next(s) += 1
        val nb = accLog - (31 - Integer.numberOfLeadingZeros(x))
        nbBits(u) = nb
        newState(u) = (x << nb) - size
      }
    }
  }

  /** Read an FSE normalized-count table description (read FORWARD,
    * little-endian bits). Returns (counts incl. -1 entries, accLog,
    * bytes consumed).
    */
  private def readNCount(src: Array[Byte], from: Int, maxSymbol: Int,
                         maxAccLog: Int): (Array[Int], Int, Int) = {
    var bitPos = 0
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = bitPos + i
        val byteIdx = from + (p >> 3)
        val bit = if (byteIdx < src.length) (src(byteIdx) >>> (p & 7)) & 1 else 0
        v |= bit << i
        i += 1
      }
      v
    }
    def take(n: Int): Int = { val v = peek(n); bitPos += n; v }
    val accLog = take(4) + 5
    if (accLog > maxAccLog) fail(s"FSE accuracy $accLog exceeds max $maxAccLog")
    val tableSize = 1 << accLog
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accLog + 1
    val counts = new Array[Int](maxSymbol + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        // runs of zero-probability symbols
        while (peek(2) == 3) { take(2); charnum += 3; if (charnum > maxSymbol + 1) fail("zero repeat overrun") }
        charnum += take(2)
        previous0 = false
      }
      if (charnum > maxSymbol) fail("FSE symbol overrun")
      val max = (2 * threshold - 1) - remaining
      var count = 0
      if ((peek(nbBits - 1) & (threshold - 1)) < max) {
        count = take(nbBits - 1) & (threshold - 1)
      } else {
        count = take(nbBits) & (2 * threshold - 1)
        if (count >= threshold) count -= max
      }
      count -= 1 // value is count+1; -1 encodes "less than 1"
      remaining -= math.abs(count)
      counts(charnum) = count
      charnum += 1
      previous0 = count == 0
      while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
    }
    if (remaining != 1) fail("FSE counts do not sum to table size")
    ((counts, accLog, (bitPos + 7) / 8))
  }

  // -------------------------------------------------------------- Huffman

  private final class HufTable(weights: Array[Int]) {
    // last weight is implicit: total must reach a power of two
    val total = weights.map(w => if (w > 0) 1 << (w - 1) else 0).sum
    if (total < 1) fail("huffman weights empty")
    val maxBits = 32 - Integer.numberOfLeadingZeros(total)
    private val rest = (1 << maxBits) - total
    if (rest < 1 || Integer.bitCount(rest) != 1) fail("huffman weights corrupt")
    val lastWeight = (31 - Integer.numberOfLeadingZeros(rest)) + 1
    val allWeights = weights :+ lastWeight
    if (maxBits > 11) fail(s"huffman maxBits $maxBits exceeds 11")
    val size = 1 << maxBits
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    locally {
      // rank start offsets: lower weights (longer codes) at lower indices
      val rankCount = new Array[Int](maxBits + 2)
      for (w <- allWeights if w > 0) rankCount(w) += 1
      val rankStart = new Array[Int](maxBits + 2)
      var nextStart = 0
      for (w <- 1 to maxBits) {
        rankStart(w) = nextStart
        nextStart += rankCount(w) << (w - 1)
      }
      if (nextStart != size) fail("huffman table fill mismatch")
      for (s <- allWeights.indices if allWeights(s) > 0) {
        val w = allWeights(s)
        val len = 1 << (w - 1)
        val start = rankStart(w)
        var i = 0
        while (i < len) {
          symbol(start + i) = s
          nbBits(start + i) = maxBits + 1 - w
          i += 1
        }
        rankStart(w) += len
      }
    }
  }

  /** Huffman decode `n` symbols from a backward stream. Implemented
    * with explicit peek/consume since codes are variable-length.
    */
  private def hufDecodeStream(t: HufTable, src: Array[Byte], from: Int,
                              until: Int, out: Array[Byte], outFrom: Int,
                              n: Int): Unit = {
    // local backward reader with peek semantics
    if (until <= from) fail("empty huffman stream")
    val last = src(until - 1) & 0xff
    if (last == 0) fail("huffman stream missing end marker")
    var bitsLeft = (until - from - 1) * 8 + (31 - Integer.numberOfLeadingZeros(last))
    def peekBits(nb: Int): Int = {
      var v = 0
      var i = 0
      while (i < nb) {
        val bitPos = bitsLeft - 1 - i
        val bit =
          if (bitPos >= 0) (src(from + (bitPos >> 3)) >>> (bitPos & 7)) & 1
          else 0
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    var o = 0
    while (o < n) {
      val idx = peekBits(t.maxBits)
      val s = t.symbol(idx)
      val nb = t.nbBits(idx)
      if (nb > math.max(0, bitsLeft)) fail("huffman stream exhausted early")
      bitsLeft -= nb
      out(outFrom + o) = s.toByte
      o += 1
    }
    if (bitsLeft != 0) fail(s"huffman stream has $bitsLeft leftover bits")
  }

  /** Read a Huffman tree description. Returns (table, bytes consumed). */
  private def readHufTree(src: Array[Byte], from: Int): (HufTable, Int) = {
    if (from >= src.length) fail("missing huffman tree header")
    val h = src(from) & 0xff
    if (h >= 128) {
      val numWeights = h - 127
      val bytes = (numWeights + 1) / 2
      if (from + 1 + bytes > src.length) fail("truncated direct huffman weights")
      val w = new Array[Int](numWeights)
      for (i <- 0 until numWeights) {
        val b = src(from + 1 + i / 2) & 0xff
        w(i) = if (i % 2 == 0) b >>> 4 else b & 0xf
      }
      (new HufTable(w), 1 + bytes)
    } else {
      // FSE-compressed weights: h = compressed size
      val end = from + 1 + h
      if (end > src.length) fail("truncated FSE huffman weights")
      val (counts, accLog, hdr) = readNCount(src, from + 1, 255, 6)
      val table = new FseTable(accLog, counts)
      val br = new BackBits(src, from + 1 + hdr, end)
      var st1 = br.read(accLog)
      var st2 = br.read(accLog)
      if (br.overflowed) fail("huffman weight stream too small")
      val w = new scala.collection.mutable.ArrayBuffer[Int](64)
      var done = false
      while (!done) {
        w += table.symbol(st1)
        if (w.length > 255) fail("more than 255 huffman weights")
        st1 = table.newState(st1) + br.read(table.nbBits(st1))
        if (br.overflowed) { w += table.symbol(st2); done = true }
        else {
          w += table.symbol(st2)
          if (w.length > 255) fail("more than 255 huffman weights")
          st2 = table.newState(st2) + br.read(table.nbBits(st2))
          if (br.overflowed) { w += table.symbol(st1); done = true }
        }
      }
      (new HufTable(w.toArray), 1 + h)
    }
  }

  // ------------------------------------------------- sequence code tables

  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1,
    1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val llDefaultTable = new FseTable(6, LlDefault)
  private lazy val mlDefaultTable = new FseTable(6, MlDefault)
  private lazy val ofDefaultTable = new FseTable(5, OfDefault)

  private def rleTable(sym: Int): FseTable = {
    val t = new FseTable(0, Array(1)) // 1-cell table, then patch symbol
    t.symbol(0) = sym
    t.nbBits(0) = 0
    t.newState(0) = 0
    t
  }

  // ----------------------------------------------------------- decompress

  private final class Tables(var ll: FseTable, var of: FseTable, var ml: FseTable,
                             var huf: HufTable)

  /** Decode every zstd frame in `src` (skippable frames skipped),
    * concatenating the content.
    */
  def decompress(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, src.length * 3))
    decodeFrames(src).foreach { case (_, bytes) => out.write(bytes) }
    out.toByteArray
  }

  /** Decode concatenated zstd frames → (frameByteOffset, content) per
    * data frame (skippable frames consume bytes but emit nothing) —
    * the member splitter for `.warc.zst`-style record-per-frame blobs,
    * the [[Warc.gunzipMembers]] twin.
    */
  def decodeFrames(src: Array[Byte]): Seq[(Long, Array[Byte])] = {
    var p = 0
    val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    while (p < src.length) {
      if (p + 4 > src.length) fail("truncated magic")
      val magic = le32(src, p)
      if ((magic & 0xfffffff0L) == 0x184d2a50L) { // skippable frame
        if (p + 8 > src.length) fail("truncated skippable frame")
        // size stays a Long until bounds-checked: a 32-bit size >= 2^31
        // went negative as an Int and moved p BACKWARD (non-termination)
        // or past the array (raw AIOOBE) instead of failing loud
        val sz = le32(src, p + 4)
        if (sz > src.length.toLong - p - 8) fail("skippable frame overruns input")
        p += 8 + sz.toInt
      } else if (magic == 0xfd2fb528L) {
        val start = p
        val out = new java.io.ByteArrayOutputStream(64 << 10)
        p = decodeFrame(src, p + 4, out)
        members += ((start.toLong, out.toByteArray))
      } else fail(f"bad magic $magic%08x")
    }
    members.toSeq
  }

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def decodeFrame(src: Array[Byte], start: Int,
                          out: java.io.ByteArrayOutputStream): Int = {
    var p = start
    if (p >= src.length) fail("truncated frame header")
    val fhd = src(p) & 0xff; p += 1
    val dictFlag = fhd & 3
    val checksum = (fhd & 4) != 0
    val singleSeg = (fhd & 0x20) != 0
    val fcsFlag = fhd >>> 6
    if ((fhd & 8) != 0) fail("reserved frame header bit set")
    if (!singleSeg) p += 1 // window descriptor: sized but unused here
    dictFlag match {
      case 0 => ()
      case 1 | 2 | 3 =>
        val n = dictFlag match { case 1 => 1; case 2 => 2; case _ => 4 }
        var id = 0L
        for (i <- 0 until n) id |= (src(p + i) & 0xffL) << (8 * i)
        p += n
        if (id != 0) fail("dictionaries not supported")
    }
    val fcsSize = fcsFlag match {
      case 0 => if (singleSeg) 1 else 0
      case 1 => 2; case 2 => 4; case 3 => 8
    }
    p += fcsSize
    if (p > src.length) fail("truncated frame header fields")

    val tables = new Tables(null, null, null, null)
    var last = false
    val reps = Array(1, 4, 8)
    val buf = new java.io.ByteArrayOutputStream(64 << 10)
    while (!last) {
      if (p + 3 > src.length) fail("truncated block header")
      val bh = (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) | ((src(p + 2) & 0xff) << 16)
      p += 3
      last = (bh & 1) == 1
      val btype = (bh >>> 1) & 3
      val bsize = bh >>> 3
      btype match {
        case 0 => // raw
          if (p + bsize > src.length) fail("raw block overruns input")
          buf.write(src, p, bsize); p += bsize
        case 1 => // RLE
          if (p >= src.length) fail("truncated RLE block")
          val b = src(p); p += 1
          val run = new Array[Byte](bsize)
          Arrays.fill(run, b)
          buf.write(run)
        case 2 =>
          if (p + bsize > src.length) fail("compressed block overruns input")
          decodeCompressedBlock(src, p, p + bsize, buf, tables, reps)
          p += bsize
        case 3 => fail("reserved block type")
      }
    }
    out.write(buf.toByteArray)
    if (checksum) {
      if (p + 4 > src.length) fail("truncated content checksum")
      p += 4 // consumed, not verified (documented contract)
    }
    p
  }

  private def decodeCompressedBlock(src: Array[Byte], from: Int, until: Int,
                                    out: java.io.ByteArrayOutputStream,
                                    tables: Tables, reps: Array[Int]): Unit = {
    var p = from
    // ---- literals section
    if (p >= until) fail("empty compressed block")
    val lh = src(p) & 0xff
    val litType = lh & 3
    val sizeFormat = (lh >>> 2) & 3
    var literals: Array[Byte] = null
    litType match {
      case 0 | 1 => // raw | RLE
        val regen = sizeFormat match {
          case 0 | 2 => p += 1; lh >>> 3
          case 1 =>
            if (p + 2 > until) fail("truncated literals header")
            val v = (lh >>> 4) | ((src(p + 1) & 0xff) << 4); p += 2; v
          case 3 =>
            if (p + 3 > until) fail("truncated literals header")
            val v = (lh >>> 4) | ((src(p + 1) & 0xff) << 4) |
              ((src(p + 2) & 0xff) << 12)
            p += 3; v
        }
        if (litType == 0) {
          if (p + regen > until) fail("raw literals overrun block")
          literals = Arrays.copyOfRange(src, p, p + regen); p += regen
        } else {
          if (p >= until) fail("truncated RLE literal")
          literals = new Array[Byte](regen)
          Arrays.fill(literals, src(p)); p += 1
        }
      case 2 | 3 => // compressed | treeless (repeat tree)
        var regen = 0; var comp = 0; var fourStreams = true
        sizeFormat match {
          case 0 | 1 =>
            if (p + 3 > until) fail("truncated literals header")
            val v = lh >>> 4 | ((src(p + 1) & 0xff) << 4) | ((src(p + 2) & 0xff) << 12)
            regen = v & 0x3ff; comp = v >>> 10
            fourStreams = sizeFormat == 1
            p += 3
          case 2 =>
            if (p + 4 > until) fail("truncated literals header")
            val v = (lh >>> 4).toLong | ((src(p + 1) & 0xffL) << 4) |
              ((src(p + 2) & 0xffL) << 12) | ((src(p + 3) & 0xffL) << 20)
            regen = (v & 0x3fff).toInt; comp = (v >>> 14).toInt
            p += 4
          case 3 =>
            if (p + 5 > until) fail("truncated literals header")
            val v = (lh >>> 4).toLong | ((src(p + 1) & 0xffL) << 4) |
              ((src(p + 2) & 0xffL) << 12) | ((src(p + 3) & 0xffL) << 20) |
              ((src(p + 4) & 0xffL) << 28)
            regen = (v & 0x3ffff).toInt; comp = (v >>> 18).toInt
            p += 5
        }
        val litEnd = p + comp
        if (litEnd > until) fail("compressed literals overrun block")
        var q = p
        if (litType == 2) {
          val (t, used) = readHufTree(src, q)
          tables.huf = t
          q += used
        } else if (tables.huf == null) fail("treeless literals with no previous tree")
        literals = new Array[Byte](regen)
        if (!fourStreams) {
          hufDecodeStream(tables.huf, src, q, litEnd, literals, 0, regen)
        } else {
          if (q + 6 > litEnd) fail("truncated jump table")
          val s1 = (src(q) & 0xff) | ((src(q + 1) & 0xff) << 8)
          val s2 = (src(q + 2) & 0xff) | ((src(q + 3) & 0xff) << 8)
          val s3 = (src(q + 4) & 0xff) | ((src(q + 5) & 0xff) << 8)
          q += 6
          val seg = (regen + 3) / 4
          val starts = Array(q, q + s1, q + s1 + s2, q + s1 + s2 + s3)
          val ends = Array(q + s1, q + s1 + s2, q + s1 + s2 + s3, litEnd)
          val sizes = Array(seg, seg, seg, regen - 3 * seg)
          if (sizes(3) < 0) fail("negative fourth literal stream size")
          var i = 0
          var o = 0
          while (i < 4) {
            if (ends(i) > litEnd || starts(i) >= ends(i)) fail("bad literal stream bounds")
            hufDecodeStream(tables.huf, src, starts(i), ends(i), literals, o, sizes(i))
            o += sizes(i)
            i += 1
          }
        }
        p = litEnd
    }

    // ---- sequences section
    if (p >= until) fail("missing sequences section")
    val b0 = src(p) & 0xff; p += 1
    var nSeq = 0
    if (b0 == 0) nSeq = 0
    else if (b0 < 128) nSeq = b0
    else if (b0 < 255) {
      if (p >= until) fail("truncated sequence count")
      nSeq = ((b0 - 128) << 8) + (src(p) & 0xff); p += 1
    } else {
      if (p + 2 > until) fail("truncated sequence count")
      nSeq = (src(p) & 0xff) + ((src(p + 1) & 0xff) << 8) + 0x7f00; p += 2
    }
    if (nSeq == 0) { out.write(literals); return }

    val modes = src(p) & 0xff; p += 1
    if ((modes & 3) != 0) fail("reserved sequence mode bits set")
    def loadTable(mode: Int, maxSym: Int, maxLog: Int, default: => FseTable,
                  prev: FseTable, what: String): FseTable = mode match {
      case 0 => default
      case 1 =>
        if (p >= until) fail(s"truncated $what RLE byte")
        val sym = src(p) & 0xff; p += 1
        if (sym > maxSym) fail(s"$what RLE symbol $sym out of range")
        rleTable(sym)
      case 2 =>
        val (counts, accLog, used) = readNCount(src, p, maxSym, maxLog)
        p += used
        new FseTable(accLog, counts)
      case 3 =>
        if (prev == null) fail(s"$what repeat mode with no previous table")
        prev
    }
    tables.ll = loadTable((modes >>> 6) & 3, 35, 9, llDefaultTable, tables.ll, "LL")
    tables.of = loadTable((modes >>> 4) & 3, 31, 8, ofDefaultTable, tables.of, "OF")
    tables.ml = loadTable((modes >>> 2) & 3, 52, 9, mlDefaultTable, tables.ml, "ML")

    val br = new BackBits(src, p, until)
    var llState = br.read(tables.ll.accLog)
    var ofState = br.read(tables.of.accLog)
    var mlState = br.read(tables.ml.accLog)
    if (br.overflowed) fail("sequence stream too small for initial states")

    var litPos = 0
    val outBytes = new GrowBuf(out)
    var i = 0
    while (i < nSeq) {
      val ofCode = tables.of.symbol(ofState)
      val mlCode = tables.ml.symbol(mlState)
      val llCode = tables.ll.symbol(llState)
      if (ofCode > 31) fail(s"offset code $ofCode out of range")
      if (mlCode > 52 || llCode > 35) fail("sequence code out of range")
      val ofValue = (1L << ofCode) + (br.read(ofCode) & ((1L << ofCode) - 1))
      val ml = MlBase(mlCode) + br.read(MlExtra(mlCode))
      val ll = LlBase(llCode) + br.read(LlExtra(llCode))
      if (br.overflowed) fail("sequence stream exhausted mid-sequence")
      // repeat-offset resolution
      var offset = 0
      if (ofValue > 3) {
        offset = (ofValue - 3).toInt
        reps(2) = reps(1); reps(1) = reps(0); reps(0) = offset
      } else {
        val idx0 = if (ll == 0) ofValue.toInt else ofValue.toInt - 1
        if (ll == 0) {
          // value 1 -> rep2, 2 -> rep3, 3 -> rep1 - 1
          ofValue.toInt match {
            case 1 =>
              offset = reps(1); val t = reps(1); reps(1) = reps(0); reps(0) = t
            case 2 =>
              offset = reps(2); reps(2) = reps(1); reps(1) = reps(0); reps(0) = offset
            case 3 =>
              offset = reps(0) - 1
              if (offset <= 0) fail("repeat offset underflow")
              reps(2) = reps(1); reps(1) = reps(0); reps(0) = offset
          }
        } else {
          ofValue.toInt match {
            case 1 => offset = reps(0)
            case 2 =>
              offset = reps(1); val t = reps(1); reps(1) = reps(0); reps(0) = t
            case 3 =>
              offset = reps(2); reps(2) = reps(1); reps(1) = reps(0); reps(0) = offset
          }
        }
      }
      // copy literals then the match
      if (litPos + ll > literals.length) fail("literal run overruns buffer")
      outBytes.append(literals, litPos, ll)
      litPos += ll
      if (offset > outBytes.length) fail(s"match offset $offset beyond history")
      outBytes.copyBack(offset, ml)
      i += 1
      if (i < nSeq) {
        llState = tables.ll.newState(llState) + br.read(tables.ll.nbBits(llState))
        mlState = tables.ml.newState(mlState) + br.read(tables.ml.nbBits(mlState))
        ofState = tables.of.newState(ofState) + br.read(tables.of.nbBits(ofState))
        if (br.overflowed) fail("sequence stream exhausted between sequences")
      }
    }
    if (br.remaining != 0) fail(s"${br.remaining} leftover sequence bits")
    // trailing literals
    outBytes.append(literals, litPos, literals.length - litPos)
    outBytes.flushTo()
  }

  /** Growable output that supports overlap-correct back-copies across
    * the whole frame history (the ByteArrayOutputStream holds committed
    * blocks; this holds the current block until flush).
    */
  private final class GrowBuf(committed: java.io.ByteArrayOutputStream) {
    private val base = committed.toByteArray
    private var cur = new Array[Byte](4096)
    private var n = 0
    def length: Long = base.length.toLong + n
    private def ensure(extra: Int): Unit =
      if (n + extra > cur.length) {
        var cap = cur.length
        while (cap < n + extra) cap *= 2
        cur = Arrays.copyOf(cur, cap)
      }
    def append(src: Array[Byte], from: Int, len: Int): Unit = {
      if (len < 0) fail("negative literal length")
      ensure(len)
      System.arraycopy(src, from, cur, n, len)
      n += len
    }
    def copyBack(offset: Int, len: Int): Unit = {
      ensure(len)
      var k = 0
      while (k < len) {
        val pos = base.length.toLong + n - offset
        val b =
          if (pos < base.length) base(pos.toInt)
          else cur((pos - base.length).toInt)
        cur(n) = b
        n += 1
        k += 1
      }
    }
    def flushTo(): Unit = committed.write(cur, 0, n)
  }

  // -------------------------------------------------------- store encoder

  /** Spec-valid store-mode zstd frame: raw blocks with RLE blocks for
    * byte runs ≥ 16 — enough real format structure for deterministic
    * fixtures (block framing, RLE path, frame content size), while the
    * decoder above carries the compressed-format surface (validated
    * against the reference encoder in ZstdSpec).
    */
  def zstdCompressStore(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length + 32)
    // magic
    out.write(0x28); out.write(0xb5); out.write(0x2f); out.write(0xfd)
    // frame header: single-segment with 8-byte FCS (fcsFlag=3, singleSeg)
    out.write(0xc0 | 0x20)
    var sz = src.length.toLong
    for (_ <- 0 until 8) { out.write((sz & 0xff).toInt); sz >>>= 8 }
    def blockHeader(lastB: Boolean, tpe: Int, size: Int): Unit = {
      val bh = (if (lastB) 1 else 0) | (tpe << 1) | (size << 3)
      out.write(bh & 0xff); out.write((bh >>> 8) & 0xff); out.write((bh >>> 16) & 0xff)
    }
    if (src.isEmpty) { blockHeader(lastB = true, 0, 0); return out.toByteArray }
    var p = 0
    while (p < src.length) {
      // find a run
      var runEnd = p
      while (runEnd < src.length && src(runEnd) == src(p)) runEnd += 1
      if (runEnd - p >= 16) {
        // RFC 8878 Block_Maximum_Size: an RLE block's REGENERATED size is
        // capped at 128 KiB (and the 21-bit header field silently
        // truncated past 2^21) — long runs emit a chain of capped blocks
        while (p < runEnd) {
          val n = math.min(runEnd - p, 128 * 1024)
          blockHeader(p + n == src.length, 1, n)
          out.write(src(p))
          p += n
        }
      } else {
        // raw block up to the next long run (or 64 KiB)
        var q = p
        var stop = false
        while (!stop && q < src.length && q - p < 65536) {
          var r = q
          while (r < src.length && src(r) == src(q)) r += 1
          if (r - q >= 16 && q > p) stop = true // run starts its own block
          else q = r
        }
        blockHeader(q == src.length, 0, q - p)
        out.write(src, p, q - p)
        p = q
      }
    }
    out.toByteArray
  }
}
