package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.joins.SpatialJoins
import graft.table.{CheckpointedWriter, Snapshot, SnapshotStore}

/** The north-rule job: geocode web pages → hex res-7 tiles → spatial join
  * against the polygon table → per-(polygon, cell) tile aggregates →
  * checkpointed snapshot commit.
  *
  * Scale design (BASELINE.json): the page table is the 10^12-row side —
  * it is NEVER shuffled before aggregation. Geocode + cell assignment are
  * map-only expressions; the polygon join is a broadcast R-tree lookup;
  * the single shuffle is the partial-aggregated groupBy on (poly, cell).
  * Hot cells (cities) are handled by map-side combine (partial agg) + AQE;
  * the checkpointed write buckets cells with a hash so commits are
  * balanced.
  */
object Pipeline {

  /** Deterministic synthetic page table of exactly the input_hint shape:
    * (url string, warc_ts timestamp, html binary, text string, lang string).
    * Seeded by row id; `text` is a pure function of the url.
    */
  def synthPages(spark: SparkSession, n: Long, partitions: Int): DataFrame = {
    val langs = array(lit("en"), lit("de"), lit("fr"), lit("da"), lit("es"))
    spark.range(0, n, 1, partitions)
      .withColumn("url", concat(lit("https://host"), (col("id") % 997).cast("string"),
        lit(".example/p/"), col("id").cast("string")))
      .withColumn("warc_ts", timestamp_seconds(lit(1704067200L) + col("id") % 31536000L))
      .withColumn("text", concat(lit("page body "), md5(col("url")), lit(" of "), col("url")))
      .withColumn("html", encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")), "UTF-8"))
      .withColumn("lang", element_at(langs, (pmod(hash(col("url")), lit(5)) + 1).cast("int")))
      .select("url", "warc_ts", "html", "text", "lang")
  }

  /** Geocode + tile assignment (map-only; no shuffle). */
  def tilePages(pages: DataFrame, res: Int): DataFrame = {
    GraftFunctions.register(pages.sparkSession)
    pages
      .withColumn("geo", GraftFunctions.geocodeUrl(col("url")))
      .withColumn("h3", GraftFunctions.h3Cell(col("geo.lon"), col("geo.lat"), lit(res)))
  }

  /** Full tiling job with checkpointed output. Returns (snapshot, tiles). */
  def tilingJob(spark: SparkSession, pages: DataFrame, outRoot: String,
                res: Int = 7, numBuckets: Int = 64, bucketsPerCommit: Int = 16,
                failAfterCommits: Int = Int.MaxValue,
                commitMode: String = "direct"): (Snapshot, Long) = {
    val tiled = tilePages(pages, res)
    val joined = SpatialJoins.pipJoinBroadcast(
      tiled.select(col("url"), col("geo.lon").as("lon"), col("geo.lat").as("lat"), col("h3")),
      Fixtures.polygons, "lon", "lat")
    val agg = joined
      .groupBy(col("poly_id"), col("h3"))
      .agg(count(lit(1)).as("n_pages"))
      .withColumn("bucket", pmod(hash(col("h3")), lit(numBuckets)).cast("int"))
    // cache only when several commit groups will re-scan the aggregate;
    // a single-group run consumes it exactly once (fused into the write)
    val multiGroup = bucketsPerCommit < numBuckets
    if (multiGroup) agg.persist()
    try {
      val store = new SnapshotStore(outRoot)
      val writer = new CheckpointedWriter(store, lineage = s"pages@res$res")
      val (snap, _) = writer.run(agg, numBuckets, bucketsPerCommit, failAfterCommits,
        mode = commitMode)
      val tiles = snap.partitions.values.map(_.rows).sum
      (snap, tiles)
    } finally if (multiGroup) agg.unpersist()
  }
}
