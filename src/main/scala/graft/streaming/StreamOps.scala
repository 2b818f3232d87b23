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

  /** Stateful streaming sessionization — custom per-key state via
    * flatMapGroupsWithState (the north-rule "custom state" surface):
    * events grouped by user; a session closes when `gapSec` passes
    * without activity (event-time timeout). Emits
    * (user_id, session_start_ms, n_events) per closed session.
    * Batch equivalent: ops/Events.sessionize (lag-window form).
    */
  /** Streaming exact dedup on the content digest — the incremental form
    * of Dedup.exact: first occurrence of each md5(text) within the
    * watermark horizon passes, later duplicates are dropped, and state
    * for digests older than the watermark is evicted (bounded state at
    * web-scale ingest; cross-horizon dups are the batch job's business).
    */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("ets", col(tsCol).cast("timestamp"))
      .withColumn("text_md5", md5(encode(col(textCol), "UTF-8")))
      .withWatermark("ets", watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  def sessionizeStream(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000L // milliseconds internally

    // the watermarked column itself must survive into the grouped Dataset
    val typed = events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", s"${gapSec * 2} seconds")
      .select(col("user_id").cast("long").as("user_id"), col("ets"))
      .as[(Long, java.sql.Timestamp)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap → close the open session
            val out = state.getOption.map { case (s, _, n) => (user, s, n) }
            state.remove()
            out.iterator
          } else {
            // fold the micro-batch's events (one open session per user)
            val sorted = rows.map(_._2.getTime).toArray.sorted
            var open = state.getOption
            val closed = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            sorted.foreach { us =>
              open match {
                case Some((s, last, n)) if us - last <= gapUs =>
                  open = Some((s, us, n + 1))
                case Some((s, _, n)) =>
                  closed += ((user, s, n))
                  open = Some((us, us, 1L))
                case None =>
                  open = Some((us, us, 1L))
              }
            }
            open.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gapSec * 2000)
            }
            closed.iterator
          }
      }
      .toDF("user_id", "session_start_ms", "n_events")
  }

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
