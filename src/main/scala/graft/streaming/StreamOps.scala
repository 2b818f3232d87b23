package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference has no streaming
  * (SURVEY.md §2.10); this is the forward-looking stream form of the
  * batch ops: the page/event tail is the source, watermark on event time,
  * windowed aggregates, and the same geocode→cell expressions running
  * per-record.
  */
object StreamOps {

  /** Streaming parquet source over a directory of event files. */
  def eventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts per event type with a watermark — late data
    * beyond the watermark is dropped (standard event-time semantics).
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * lit(100.0)).cast("long")).as("cents_sum"))

  /** Streaming tiling: geocode each page record and count per hex cell —
    * the incremental form of Pipeline.tilePages. Works on any stream with
    * a `url` column.
    */
  def streamingTileCounts(pages: DataFrame, res: Int): DataFrame = {
    graft.expr.GraftFunctions.register(pages.sparkSession)
    import graft.expr.GraftFunctions._
    pages
      .withColumn("geo", geocodeUrl(col("url")))
      .withColumn("h3", h3Cell(col("geo.lon"), col("geo.lat"), lit(res)))
      .groupBy("h3")
      .agg(count(lit(1)).as("n_pages"))
  }
}
