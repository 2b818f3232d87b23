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
}
