package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def stageDir(src: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("stream_src")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  test("streaming HLL registers equal the batch sketch exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = graft.ops.Sketches
      .hllRegisters(docs.select(col("lang"), col("text")),
        "text", Seq("lang"), p = 9, family = "xxhash64")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val stream = spark.readStream.schema(docs.schema)
      .parquet(stageDir("/root/testdata/sf0.001/documents.parquet"))
      .select(col("lang"), col("text"))
    val q = StreamOps.hllRegisterStream(stream, "text", Seq("lang"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_regs").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hll_regs")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got === want)
    } finally q.stop()
  }

  test("streaming geofence alerts equal the batch PIP join exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://host"), (col("doc_id") % 97).cast("string"),
          lit(".example/"), col("doc_id").cast("string")).as("url"))
    val polys = graft.pipeline.Fixtures.polygons
    val want = StreamOps.geofenceStream(docs, polys)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(want.nonEmpty, "geofence fixture should alert on some pages")
    val stream = spark.readStream.schema(docs.schema)
      .parquet({
        val dir = java.nio.file.Files.createTempDirectory("geofence_src")
        docs.coalesce(1).write.mode("overwrite").parquet(dir.toString + "/d")
        dir.toString + "/d"
      })
    val q = StreamOps.geofenceStream(stream, polys)
      .writeStream.outputMode("append")
      .format("memory").queryName("geofence").start()
    try {
      q.processAllAvailable()
      val got = spark.table("geofence")
        .collect().map(r => (r.getString(0), r.getLong(3))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch self-join pair set") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val want = StreamOps.copresenceStream(events, events)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty, "interval-join fixture should pair some events")
    def stream() = spark.readStream.schema(events.schema)
      .parquet(stageDir("/root/testdata/sf0.001/events.parquet"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val q = StreamOps.copresenceStream(stream(), stream())
      .writeStream.outputMode("append")
      .format("memory").queryName("copresence_join").start()
    try {
      q.processAllAvailable()
      val got = spark.table("copresence_join")
        .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming KMV registers equal the batch sketch exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = graft.ops.Sketches
      .kmvRegisters(docs.select(col("lang"), col("text")),
        "text", Seq("lang"), k = 16, family = "xxhash64")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val stream = spark.readStream.schema(docs.schema)
      .parquet(stageDir("/root/testdata/sf0.001/documents.parquet"))
      .select(col("lang"), col("text"))
    val q = StreamOps.kmvRegisterStream(stream, "text", "lang", k = 16)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_regs").start()
    try {
      q.processAllAvailable()
      val got = spark.table("kmv_regs")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming CMS registers equal the batch sketch exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = graft.ops.Sketches
      .cmsRegisters(docs.select(col("lang"), col("text")),
        "text", Seq("lang"), width = 64, depth = 3, family = "xxhash64")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val stream = spark.readStream.schema(docs.schema)
      .parquet(stageDir("/root/testdata/sf0.001/documents.parquet"))
      .select(col("lang"), col("text"))
    val q = StreamOps.cmsRegisterStream(stream, "text", Seq("lang"),
        width = 64, depth = 3)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_regs").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cms_regs")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(got === want)
    } finally q.stop()
  }

  test("streaming windowed counts equal the batch computation") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val stream = StreamOps.eventStream(spark,
      stageDir("/root/testdata/sf0.001/events.parquet"), batch.schema)
    val q = StreamOps.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select(col("window.start").cast("long").as("ws"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val expect = batch
        .withColumn("ets", col("ts").cast("timestamp"))
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === expect)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming tile counts run end-to-end with state") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val schema = docs.schema
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir("/root/testdata/sf0.001/documents.parquet"))
      .withColumn("url", concat(lit("https://host/"), col("doc_id").cast("string")))
    val q = StreamOps.streamingTileCounts(stream, res = 7)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tile_counts").start()
    try {
      q.processAllAvailable()
      val total = spark.table("tile_counts").agg(sum("n_pages")).collect()(0).getLong(0)
      assert(total === docs.count())
    } finally q.stop()
  }

  test("streaming dedup keeps one row per content digest") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_src").toString
    val rows = (0 until 300).map { i =>
      (new java.sql.Timestamp(1700000000000L + i * 1000L), s"doc-${i % 80}")
    }
    spark.createDataFrame(rows).toDF("ts", "text").write.parquet(s"$dir/p")
    val schema = spark.read.parquet(s"$dir/p").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/p")
    val q = StreamOps.dedupStream(stream, "ts", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_s").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_s").select("text").collect().map(_.getString(0))
      assert(got.length === 80)
      assert(got.toSet === (0 until 80).map(i => s"doc-$i").toSet)
    } finally q.stop()
  }

  test("stateful sessionization (flatMapGroupsWithState) closes sessions like batch") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val stream = StreamOps.eventStream(spark,
      stageDir("/root/testdata/sf0.001/events.parquet"), batch.schema)
    val q = StreamOps.sessionizeStream(stream, gapSec = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch oracle: per user, split sorted event times at >gap; sessions
      // closed WITHIN the stream are all but the final (still-open) one
      val byUser = batch
        .select(col("user_id").cast("long"),
          unix_millis(col("ts").cast("timestamp")))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).sorted }
      val gapUs = 1800L * 1000L
      val all = collection.mutable.Set.empty[(Long, Long, Long)]
      val nonFinal = collection.mutable.Set.empty[(Long, Long, Long)]
      byUser.foreach { case (u, times) =>
        var start = times.head; var last = times.head; var n = 1L
        val sessions = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        times.tail.foreach { t =>
          if (t - last <= gapUs) { last = t; n += 1 }
          else { sessions += ((u, start, n)); start = t; last = t; n = 1 }
        }
        sessions += ((u, start, n))
        sessions.foreach(all += _)
        sessions.dropRight(1).foreach(nonFinal += _)
      }
      assert(got.subsetOf(all), s"emitted a session batch never saw: ${got.diff(all).take(3)}")
      assert(nonFinal.subsetOf(got), s"missing closed sessions: ${nonFinal.diff(got).take(3)}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  /** Near-dup corpus: 60 docs in 20 clusters of 3; cluster members share
    * 10 of 12 tokens (J ≈ 0.71) so LSH(k=8, bands=4) catches them with
    * near-certainty; distinct clusters share nothing.
    */
  private def nearDupCorpus(baseTs: Long): Seq[(Long, java.sql.Timestamp, String)] =
    (0 until 60).map { i =>
      val cluster = i / 3; val member = i % 3
      val toks = (0 until 10).map(t => s"c${cluster}w$t") ++
        Seq(s"c${cluster}v${member}a", s"c${cluster}v${member}b")
      (i.toLong, new java.sql.Timestamp(baseTs + i * 1000L), toks.mkString(" "))
    }

  test("streaming LSH candidate pairs equal the batch banding on a replayed corpus") {
    val docs = nearDupCorpus(1700000000000L)
    val dir = java.nio.file.Files.createTempDirectory("lsh_src").toString
    spark.createDataFrame(docs).toDF("doc_id", "ts", "text").write.parquet(s"$dir/p")
    val batchDf = spark.read.parquet(s"$dir/p")
    // batch oracle: the SAME banding machinery, threshold 0 keeps every
    // candidate the bands surface (xxhash64 production family)
    val expect = graft.ops.Dedup.minhashLshPairs(batchDf, k = 8, bands = 4,
        threshold = 0.0, probeFilter = lit(true), family = "xxhash64")
      .select("doc_a", "doc_b").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    val stream = spark.readStream.schema(batchDf.schema).parquet(s"$dir/p")
    val q = StreamOps.lshCandidateStream(stream, "ts", "doc_id", "text",
        k = 8, bands = 4, watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("lsh_pairs").start()
    try {
      q.processAllAvailable()
      val got = spark.table("lsh_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"missing ${expect.diff(got).take(5)}, extra ${got.diff(expect).take(5)}")
      assert(got.size >= 20, s"only ${got.size} pairs — corpus should yield ~60")
      // per-band emission: at most `bands` copies of any pair
      val withDups = spark.table("lsh_pairs").count()
      assert(withDups <= got.size * 4L, s"more copies than bands: $withDups rows for ${got.size} pairs")
    } finally q.stop()
  }

  test("streaming CUSUM equals the batch recursion on closed hours") {
    // wave 1: hand-planted hourly counts for one type (spike at hour 5);
    // wave 2 three hours later pushes the watermark past every wave-1
    // hour, closing them all in order
    val t0 = 1700000000000L // ms, on an hour boundary? align below
    val h0 = (t0 / 3600000L) * 3600000L
    val counts = Seq(1L, 2L, 1L, 1L, 1L, 6L, 7L, 1L)
    val wave1 = counts.zipWithIndex.flatMap { case (n, hi) =>
      (0L until n).map(i => (hi * 100L + i, "t",
        new java.sql.Timestamp(h0 + hi * 3600000L + i * 1000L)))
    }
    val wave2 = Seq((9999L, "t",
      new java.sql.Timestamp(h0 + 12L * 3600000L)))
    val dir = java.nio.file.Files.createTempDirectory("cusum_s").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    def stage(sub: String, rows: Seq[(Long, String, java.sql.Timestamp)]): Unit = {
      spark.createDataFrame(rows).toDF("event_id", "event_type", "ts")
        .coalesce(1).write.parquet(s"$dir/$sub")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/w/$sub.parquet"))
    }
    stage("a", wave1)
    val schema = spark.read.parquet(s"$dir/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/w")
    val q = StreamOps.cusumStream(stream, k = 1, h = 4,
        watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_s").start()
    try {
      q.processAllAvailable()
      stage("b", wave2)
      q.processAllAvailable()
      val got = spark.table("cusum_s")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
      // batch oracle over wave 1 (every wave-1 hour is closed by wave 2)
      val batch = graft.ops.Events.cusum(
          spark.createDataFrame(wave1).toDF("event_id", "event_type", "ts"),
          k = 1, h = 4)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
      assert(got === batch)
      assert(got.values.exists(_._3) && got.values.exists(!_._3))
    } finally q.stop()
  }

  test("streaming SCD2 emits exactly the batch's closed intervals") {
    val h0 = 1700000000000L
    // user 1: A A B B A (dup collapse + reopen); user 2: X only
    val wave1 = Seq(
      (1L, h0 + 100000L, "A", 1L), (1L, h0 + 200000L, "A", 2L),
      (1L, h0 + 300000L, "B", 3L), (1L, h0 + 400000L, "B", 4L),
      (1L, h0 + 500000L, "A", 5L),
      (2L, h0 + 100000L, "X", 6L))
    val wave2 = Seq((9L, h0 + 4L * 3600000L, "Z", 9L))
    val dir = java.nio.file.Files.createTempDirectory("scd2_s").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    def stage(sub: String, rows: Seq[(Long, Long, String, Long)]): Unit = {
      spark.createDataFrame(rows.map { case (u, ms, v, id) =>
          (u, new java.sql.Timestamp(ms), v, id) })
        .toDF("user_id", "ts", "event_type", "event_id")
        .coalesce(1).write.parquet(s"$dir/$sub")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/w/$sub.parquet"))
    }
    stage("a", wave1)
    val schema = spark.read.parquet(s"$dir/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/w")
    val q = StreamOps.scd2Stream(stream, watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_s").start()
    try {
      q.processAllAvailable()
      stage("b", wave2)
      q.processAllAvailable()
      val got = spark.table("scd2_s").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      // batch oracle: scd2 over wave 1, closed (non-current) intervals
      val batch = graft.ops.Events.scd2(
          spark.createDataFrame(wave1.map { case (u, ms, v, id) =>
            (u, new java.sql.Timestamp(ms), v, id) })
            .toDF("user_id", "ts", "event_type", "event_id"),
          "user_id", "ts", "event_type", "event_id")
        .filter(!org.apache.spark.sql.functions.col("is_current"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime, r.getLong(4)))
        .toSet
      assert(got === batch)
      assert(got === Set(
        (1L, "A", h0 + 100000L, h0 + 300000L, 1L),
        (1L, "B", h0 + 300000L, h0 + 500000L, 2L)))
    } finally q.stop()
  }

  test("streaming url keep-latest emits the batch winners at watermark close") {
    // wave 1: two urls, multiple fetches each (one url under differing
    // scheme/www forms); wave 2 (3h later, 30-minute watermark) pushes
    // the watermark past wave 1, closing its groups
    val t0 = 1700000000L
    val wave1 = Seq(
      (1L, "https://www.a.com/x/", t0),
      (2L, "http://a.com/x", t0 + 60),
      (3L, "a.com/x#frag", t0 + 120),
      (4L, "https://b.com/y", t0 + 30),
      (5L, "b.com/y?q=1", t0 + 20)) // older than doc 4 -> loses
    val wave2 = Seq((9L, "c.com/z", t0 + 3 * 3600L))
    val dir = java.nio.file.Files.createTempDirectory("url_latest").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    def stage(sub: String, rows: Seq[(Long, String, Long)]): Unit = {
      spark.createDataFrame(rows).toDF("doc_id", "url", "warc_sec")
        .coalesce(1).write.parquet(s"$dir/$sub")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/w/$sub.parquet"))
    }
    stage("a", wave1)
    val schema = spark.read.parquet(s"$dir/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/w")
    val q = StreamOps.urlLatestStream(stream, watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("url_latest").start()
    try {
      q.processAllAvailable()
      stage("b", wave2)
      q.processAllAvailable()
      val got = spark.table("url_latest")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
        .toMap
      // batch oracle over wave 1 (the closed groups)
      val expect = graft.ops.WebOps.urlDedupLatest(
          spark.createDataFrame(wave1).toDF("doc_id", "url", "warc_sec"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
        .toMap
      assert(got.view.filterKeys(_ != "c.com/z").toMap === expect)
      // wave 2's group is still open (watermark has not passed it)
      assert(!got.contains("c.com/z"))
    } finally q.stop()
  }

  test("streaming LSH evicts bucket members past the watermark (bounded state)") {
    // two identical waves 3 hours apart with a 30-minute watermark: the
    // second wave must not pair against the first (state evicted), and
    // in-wave pairs still surface — replaying files in ts order forces
    // the watermark forward between waves
    val wave1 = nearDupCorpus(1700000000000L)
    val wave2 = nearDupCorpus(1700000000000L + 3 * 3600 * 1000L)
      .map { case (id, ts, text) => (id + 1000L, ts, text) }
    val dir = java.nio.file.Files.createTempDirectory("lsh_evict").toString
    spark.createDataFrame(wave1).toDF("doc_id", "ts", "text").write.parquet(s"$dir/w1")
    val schema = spark.read.parquet(s"$dir/w1").schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/w")
    def stage(sub: String, rows: Seq[(Long, java.sql.Timestamp, String)]): Unit = {
      spark.createDataFrame(rows).toDF("doc_id", "ts", "text")
        .coalesce(1).write.parquet(s"$dir/$sub")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src,
        java.nio.file.Paths.get(s"$dir/w/$sub.parquet"))
    }
    stage("a", wave1)
    val q = StreamOps.lshCandidateStream(stream, "ts", "doc_id", "text",
        k = 8, bands = 4, watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("lsh_evict").start()
    try {
      q.processAllAvailable()
      stage("b", wave2)
      q.processAllAvailable()
      val got = spark.table("lsh_evict")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty)
      // no cross-wave pair: ids differ by 1000 within a would-be pair
      assert(!got.exists { case (a, b) => (a < 1000) != (b < 1000) },
        s"cross-horizon pair leaked: ${got.filter { case (a, b) => (a < 1000) != (b < 1000) }.take(3)}")
      // both waves produced their own in-wave pairs
      assert(got.exists { case (a, b) => a < 1000 && b < 1000 })
      assert(got.exists { case (a, b) => a >= 1000 && b >= 1000 })
    } finally q.stop()
  }

  test("streaming .warc.gz ingest parses the exact batch record set") {
    // the ingestion front door as a stream: segment files arrive, the
    // member scan is a stateless partition map, records append downstream
    import spark.implicits._
    import graft.ops.Warc
    val pages = (0L until 60L).map(i =>
      (i, s"https://h$i.example/$i", 1704067200L + i,
        s"<html>stream page $i</html>".getBytes("UTF-8")))
      .toDF("doc_id", "url", "warc_sec", "html")
    val segs = Warc.segmentTableGz(pages, pmod(col("doc_id"), lit(4)))
    val dir = java.nio.file.Files.createTempDirectory("warcgz_stream").toString
    segs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(segs.schema).parquet(dir)
    val q = Warc.parseGzTable(stream, "seg_id", "blob")
      .select(col("target_uri"), col("member_offset"), col("rec_len"))
      .writeStream.outputMode("append").format("memory").queryName("warcgz").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warcgz")
        .as[(String, Long, Int)].collect().sorted.toSeq
      val expect = Warc.parseGzTable(segs, "seg_id", "blob")
        .select(col("target_uri"), col("member_offset"), col("rec_len"))
        .as[(String, Long, Int)].collect().sorted.toSeq
      assert(got == expect)
      assert(got.length == 60)
    } finally q.stop()
  }

  test("streaming attribution equals the batch windows on closed conversions") {
    val base = 1700000000000L // ms
    val day = 24L * 3600 * 1000
    // user 1: touch 8d before (outside lookback -> last only), touch 1d
    // before (wins last + first), purchase; user 2: no touches; user 3:
    // same-instant click+purchase (frame-peer tie)
    val wave1 = Seq(
      (1L, 1L, "click", base - 8 * day, 0.0),
      (2L, 1L, "click", base - day, 0.0),
      (3L, 1L, "purchase", base, 12.5),
      (4L, 2L, "purchase", base, 20.0),
      (5L, 3L, "click", base, 0.0),
      (6L, 3L, "purchase", base, 40.0))
    // wave 2 must be a touch/conv row: the type filter sits below the
    // watermark after pushdown, so only those rows advance event time
    val wave2 = Seq((99L, 7L, "click", base + 4L * 3600 * 1000, 0.0))
    val dir = java.nio.file.Files.createTempDirectory("attr_s").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    def mk(rows: Seq[(Long, Long, String, Long, Double)]) =
      spark.createDataFrame(rows.map { case (id, u, t, ms, v) =>
        (id, new java.sql.Timestamp(ms), u, t, v, "{}")
      }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def stage(sub: String, rows: Seq[(Long, Long, String, Long, Double)]): Unit = {
      mk(rows).coalesce(1).write.parquet(s"$dir/$sub")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/w/$sub.parquet"))
    }
    stage("a", wave1)
    val schema = spark.read.parquet(s"$dir/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/w")
    val q = StreamOps.attributionStream(stream, watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_s").start()
    try {
      q.processAllAvailable()
      stage("b", wave2)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6)))
      val got = spark.table("attr_s").collect().map(key).toMap
      val batch = graft.ops.Events.attribution(mk(wave1))
        .collect().map(key).toMap
      assert(got === batch)
      assert(got.size == 3)
      // the same-instant touch counted (frame-peer semantics)
      assert(got(6L)._4.contains(base * 1000))
    } finally q.stop()
  }
}
