package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level operators for web-corpus pipelines over the `pages` table
  * (Common-Crawl-style `(url, warc_ts, html, text, lang)` rows): URL
  * normalization for URL-keyed dedup, and per-host corpus statistics —
  * the first grouping any crawl-curation pipeline runs.
  *
  * Everything is built from codegen'd string expressions (no UDFs), and
  * every regex is written to behave identically under Java regex (Spark)
  * and RE2 (DuckDB): anchored or single-match patterns only, no
  * backreferences, no lookaround.
  */
object WebOps {

  /** Canonical URL for dedup keys: the input is lowercased FIRST (so the
    * scheme/`www.` strips see canonical case), then scheme, fragment,
    * query string, `www.` prefix, and a trailing slash are stripped (the
    * synthetic corpus is already lowercase; the spec pins the semantics
    * on mixed-case fixtures). Each step is one `regexp_replace` whose
    * pattern can match at most once, so Spark's replace-all and DuckDB's
    * replace-first agree.
    */
  def normalizeUrl(u: Column): Column = {
    val noScheme = regexp_replace(lower(u), "^[a-z][a-z0-9+.-]*://", "")
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    val noQuery = regexp_replace(noFrag, "\\?.*$", "")
    val noWww = regexp_replace(noQuery, "^www\\.", "")
    regexp_replace(noWww, "/$", "")
  }

  /** Registrable host of a normalized URL (everything before the first
    * `/`, minus any `:port`).
    */
  def hostOf(normUrl: Column): Column =
    regexp_replace(regexp_replace(normUrl, "/.*$", ""), ":[0-9]+$", "")

  /** Per-row normalization view: url → (norm_url, host). */
  def urlNormalize(pages: DataFrame): DataFrame =
    pages.select(col("doc_id"), col("url"),
      normalizeUrl(col("url")).as("norm_url"),
      hostOf(normalizeUrl(col("url"))).as("host"))

  /** Per-host corpus statistics: page count, distinct languages, total
    * text characters, first/last crawl timestamp. One hash aggregation
    * with map-side combine on the host key — the host distribution of a
    * real crawl is skewed, but the combine runs before the shuffle so a
    * hot host costs one reducer the merged partials, not the raw rows.
    */
  def hostStats(pages: DataFrame): DataFrame =
    pages
      .select(hostOf(normalizeUrl(col("url"))).as("host"),
        col("lang"), col("warc_sec"), length(col("text")).cast("long").as("n_chars"))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_pages"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("warc_sec")).as("first_sec"),
        max(col("warc_sec")).as("last_sec"))
}
