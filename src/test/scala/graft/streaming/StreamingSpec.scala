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
}
