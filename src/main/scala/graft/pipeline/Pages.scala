package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The north-rule input table: Common-Crawl-style web pages
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  *
  * Derived deterministically from the driver's `documents` parquet so the
  * DuckDB oracle can reproduce every derived column with the exact same
  * arithmetic (see [[Pages.sqlWith]] — the SQL twin of [[pages]]). The
  * `text` column is carried through BYTE-IDENTICAL (never transformed),
  * which is the reference-parity invariant (`BASELINE.json` input_hint).
  *
  * Geocoding for the oracle-checked queries is integer LCG arithmetic on
  * `doc_id` (portable to ANSI SQL); the engine's hash-geocode of raw urls
  * is [[graft.expr.GeocodeUrl]] and is exercised by the non-oracle
  * pipeline/bench path.
  */
object Pages {

  /** Cell level used for "res-7-style" tiling of pages. */
  val TileLevel = 7
  /** Finer level for per-cell statistics. */
  val FineLevel = 12

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Spark-side page derivation. Columns (all deterministic in doc_id):
    * url, warc_sec (epoch seconds), html, text, lang, lon_udeg, lat_udeg,
    * lon, lat. Microdegree integers are the source of truth; doubles are
    * derived by one identical division so DuckDB reproduces them bitwise.
    */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
    val hot = col("doc_id") % 10 === 0
    val lonU = when(hot, lit(2350000L) + (col("doc_id") % 1000) * 10)
      .otherwise((col("doc_id") * 1103515245L + 12345L) % 360000000L - 180000000L)
    val latU = when(hot, lit(48850000L) + (col("doc_id") % 1000) * 10)
      .otherwise((col("doc_id") * 2654435761L + 99991L) % 170000000L - 85000000L)
    d.select(
      col("doc_id"),
      concat(lit("https://host"), (col("doc_id") % 97).cast("string"),
             lit(".example/"), col("doc_id").cast("string")).as("url"),
      (lit(1704067200L) + col("doc_id")).as("warc_sec"),
      encode(col("text"), "UTF-8").as("html"),
      col("text"),
      col("lang"),
      lonU.as("lon_udeg"),
      latU.as("lat_udeg"),
      (lonU / lit(1000000.0)).as("lon"),
      (latU / lit(1000000.0)).as("lat"))
  }

  /** DuckDB-SQL twin of [[pages]] as a WITH clause body; oracle queries are
    * written as `WITH pages AS (<sqlPages>) SELECT ...`.
    */
  val sqlPages: String =
    """SELECT doc_id,
       'https://host' || CAST(doc_id % 97 AS VARCHAR) || '.example/' || CAST(doc_id AS VARCHAR) AS url,
       1704067200 + doc_id AS warc_sec,
       text, lang,
       CASE WHEN doc_id % 10 = 0 THEN 2350000 + (doc_id % 1000) * 10
            ELSE (doc_id * 1103515245 + 12345) % 360000000 - 180000000 END AS lon_udeg,
       CASE WHEN doc_id % 10 = 0 THEN 48850000 + (doc_id % 1000) * 10
            ELSE (doc_id * 2654435761 + 99991) % 170000000 - 85000000 END AS lat_udeg,
       (CASE WHEN doc_id % 10 = 0 THEN 2350000 + (doc_id % 1000) * 10
            ELSE (doc_id * 1103515245 + 12345) % 360000000 - 180000000 END) / 1000000.0 AS lon,
       (CASE WHEN doc_id % 10 = 0 THEN 48850000 + (doc_id % 1000) * 10
            ELSE (doc_id * 2654435761 + 99991) % 170000000 - 85000000 END) / 1000000.0 AS lat
     FROM documents""".stripMargin

  def sqlWith(body: String): String = s"WITH pages AS ($sqlPages) $body"

  /** Exact SQL mirror of GridCell.lonToX/latToY at `level` (same IEEE ops
    * in the same order as graft.index.GridCell — floor((v+off)/span*n)).
    */
  def sqlCellX(level: Int): String = {
    val n = 1L << level
    s"CAST(LEAST(GREATEST(floor((lon + 180.0) / 360.0 * $n), 0), ${n - 1}) AS BIGINT)"
  }
  def sqlCellY(level: Int): String = {
    val n = 1L << level
    s"CAST(LEAST(GREATEST(floor((lat + 90.0) / 180.0 * $n), 0), ${n - 1}) AS BIGINT)"
  }
}
