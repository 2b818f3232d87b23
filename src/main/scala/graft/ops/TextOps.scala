package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the
  * `documents` table. Every derived number is integer / per-row IEEE
  * arithmetic so the DuckDB oracles reproduce results exactly.
  */
object TextOps {

  /** Whitespace tokens, empties dropped, duplicates kept. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Exploded (doc_id, tok) view — the inverted-index building block. */
  def tokenTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))

  /** Per-doc statistics: chars, whitespace-token count, distinct tokens,
    * avg token length (exact division of two ints — identical both
    * engines), uppercase-free here (corpus is lowercase).
    */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
        .cast("long").as("n_spaces"))

  /** GPT-2-style BPE pretokenizer pattern, minus the trailing-space
    * lookahead (RE2-incompatible) so the SAME regex runs in the DuckDB
    * oracle: contractions, space-prefixed letter/digit/punctuation runs,
    * whitespace runs. Verified to tokenize identically under Java regex
    * and RE2.
    */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pretoken count per doc — the cheap LLM-cost estimator (BPE merges
    * only split pretokens further, so this lower-bounds real token
    * counts at roughly the right scale).
    */
  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
        .cast("long").as("n_pretokens"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"))

  /** Quality score: tokens-per-char density and distinct ratio — the
    * length/ratio style heuristics of web-corpus quality filtering.
    * Kept as exact ratios of integers.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    textStats(docs).select(
      col("doc_id"),
      (col("n_tokens").cast("double") / (col("n_chars").cast("double") + lit(1.0))).as("density"),
      (col("n_distinct").cast("double") / (col("n_tokens").cast("double") + lit(1.0))).as("distinct_ratio"))

  /** Marker-token counts per language; prediction = argmax count with
    * deterministic tie-break on marker order. A classic n-gram/stopword
    * language-ID heuristic, exact-portable via occurrence counting:
    * occurrences of marker m = (len(text) - len(replace(text, m, ''))) / len(m).
    */
  val langMarkers: Seq[(String, String)] = Seq(
    ("en", "the"), ("de", "der"), ("fr", "les"), ("es", "los"), ("zh", "spark"))

  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, marker, ""))) / marker.length).cast("long")

  def langId(docs: DataFrame): DataFrame = {
    val withCounts = langMarkers.foldLeft(docs.select(col("doc_id"), col("text"), col("lang"))) {
      case (d, (l, m)) => d.withColumn(s"c_$l", occurrences(col("text"), m))
    }
    // argmax with first-marker tie-break
    val best = langMarkers.map(_._1).foldLeft((lit("und"), lit(-1L))) {
      case ((bl, bc), l) =>
        val c = col(s"c_$l")
        (when(c > bc, lit(l)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }
    withCounts.select(col("doc_id"), col("lang"), best._1.as("pred_lang"), best._2.as("n_markers"))
  }

  /** Document fingerprint: md5 of the text with whitespace stripped —
    * whitespace-insensitive exact-dup key.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(encode(regexp_replace(col("text"), " ", ""), "UTF-8")).as("fp"))
}
