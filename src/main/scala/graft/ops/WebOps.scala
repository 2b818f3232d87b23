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

  /** Keep the LATEST fetch per canonical URL — the recrawl-collapse step
    * every crawl-curation pipeline runs before content dedup. Argmax is
    * expressed as max-of-struct ordered by (warc_sec, then every column
    * in table order), giving ONE hash aggregation with map-side combine:
    * at 10^12 rows the combine collapses refetches before the shuffle,
    * which beats a window sort (shuffle + per-group sort) and is
    * deterministic because the ordering key is the full row (total
    * order; exact duplicate rows are interchangeable).
    */
  def urlDedupLatest(pages: DataFrame): DataFrame = {
    val cols = pages.columns.toSeq
    val ordered = struct(col("warc_sec").as("ord_sec") +: cols.map(col): _*)
    pages
      .withColumn("norm_url", normalizeUrl(col("url")))
      .groupBy("norm_url")
      .agg(max(ordered).as("w"))
      .select(col("norm_url") +: cols.map(c => col(s"w.$c").as(c)): _*)
  }

  /** Host blocklist filter — the UT1/domain-exclusion step: drop every
    * page whose registrable host appears in `blocked(host)`. Broadcast
    * LEFT ANTI join: real blocklists are 10^5-10^6 hosts (megabytes), so
    * the corpus side never shuffles and the filter runs map-side at any
    * scale.
    */
  def filterHosts(pages: DataFrame, blocked: DataFrame): DataFrame =
    pages.withColumn("host", hostOf(normalizeUrl(col("url"))))
      .join(broadcast(blocked.select("host")), Seq("host"), "left_anti")

  /** Host-balanced corpus cap: keep at most `n` pages per host, chosen
    * uniformly-at-random but DETERMINISTICALLY by ordering each host's
    * pages on (md5(url), url) and keeping the first `n` — the standard
    * guard against a handful of mega-hosts dominating a training corpus.
    *
    * Exact top-n per key is a per-host sort, and a hot host (10^8 pages
    * of one domain at crawl scale) would sink a single reducer — so the
    * engine pre-prunes with a SALTED first stage: top-n within each of
    * `salts` hash-subgroups of the host, then top-n of the ≤ salts·n
    * survivors. Both stages are windows, but stage 1's groups are
    * hot-host/salts sized and stage 2's input is tiny. The salt choice
    * cannot change the result (any element of the true global top-n is
    * in the top-n of its own subgroup), so the oracle mirrors only the
    * one-window semantics.
    */
  def capPerHost(pages: DataFrame, n: Int, salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withHost = pages.select(col("doc_id"), col("url"),
      hostOf(normalizeUrl(col("url"))).as("host"),
      md5(encode(col("url"), "UTF-8")).as("pick"))
    val pre = Window.partitionBy(col("host"), pmod(xxhash64(col("url")), lit(salts)))
      .orderBy(col("pick"), col("url"))
    val fin = Window.partitionBy(col("host")).orderBy(col("pick"), col("url"))
    withHost
      .withColumn("prn", row_number().over(pre)).filter(col("prn") <= n)
      .withColumn("pick_rank", row_number().over(fin)).filter(col("pick_rank") <= n)
      .select("host", "doc_id", "url", "pick_rank")
  }

  /** Minimal synthetic HTML page for the extraction path: doctype, lang
    * attribute, head (title + meta), one body paragraph. Tag-only markup
    * after the text so extraction can be proven byte-identical.
    */
  def htmlWrap(url: Column, text: Column, lang: Column): Column =
    concat(lit("<!DOCTYPE html><html lang=\""), lang,
      lit("\"><head><title>"), url,
      lit("</title><meta charset=\"utf-8\"/></head><body><p id=\"main\">"),
      text, lit("</p></body></html>"))

  /** Text extraction from HTML: drop the head block (title/meta are
    * chrome, not content), then strip every remaining tag. Two codegen'd
    * regexp passes, both Java-regex/RE2 agnostic (non-greedy supported by
    * both, no lookaround); the head pattern matches at most once so
    * Spark's replace-all equals DuckDB's replace-first, and the tag strip
    * is explicitly global on both sides.
    */
  def extractText(html: Column): Column =
    regexp_replace(regexp_replace(html, "<head>.*?</head>", ""), "<[^>]*>", "")

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
