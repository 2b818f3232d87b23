package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality profiling and constraint verification (the
  * pre-ingest gate any 100-TB training-data pipeline runs before a
  * corpus snapshot is blessed). Every metric is an exact integer
  * certificate — (num, den) pairs with threshold compares done by
  * cross-multiplication — so results are order-free, parallelism-stable
  * and DuckDB-oracle-exact; nothing emits an FP ratio (callers divide).
  *
  * Scale shape: each metric is ONE aggregation whose scan prunes to the
  * single column it reads (total bytes across a suite = Σ per-check
  * column bytes, the same I/O a fused single-pass design reads), with
  * map-side combine everywhere; the containment check is a left semi
  * join on the key, never a collect.
  */
object Quality {

  private def q4(c: Column) = round(c * lit(10000.0)).cast("long")

  /** Per-column completeness/cardinality profile: one row per column
    * with exact counts (rows, filled, nulls, distinct) and truncating
    * completeness ppm. Column list is explicit so the scan prunes.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          count(col(c)).as("n_filled"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"), col("n_filled"),
          (col("n_rows") - col("n_filled")).as("n_null"), col("n_distinct"),
          expr("CAST(n_filled * 1000000 DIV n_rows AS BIGINT)")
            .as("completeness_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Numeric column summary in exact q4 ten-thousandths: min/max/sum
    * quantized per row BEFORE aggregation, so every statistic is an
    * integer and the sum is order-free.
    */
  def numericSummary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericSummary: need at least one column")
    cols.map { c =>
      df.agg(
          count(col(c)).as("n_filled"),
          min(q4(col(c))).as("min_q"),
          max(q4(col(c))).as("max_q"),
          sum(q4(col(c))).as("sum_q"))
        .select(lit(c).as("column"), col("n_filled"), col("min_q"),
          col("max_q"), col("sum_q"))
    }.reduce(_ unionByName _)
  }

  private def asCheck(name: String, numDen: DataFrame,
                      pass: (Column, Column) => Column): DataFrame =
    numDen.select(lit(name).as("check"), col("num"), col("den"),
      pass(col("num"), col("den")).as("passed"))

  /** num = non-null rows, den = all rows; passes when
    * num · 10⁶ ≥ minPpm · den (cross-multiplied, no FP). */
  def completenessCheck(df: DataFrame, c: String,
                        minPpm: Long = 1000000L): DataFrame =
    asCheck(s"complete($c)",
      df.agg(count(col(c)).as("num"), count(lit(1)).as("den")),
      (n, d) => n * lit(1000000L) >= lit(minPpm) * d)

  /** Primary-key check: distinct values = non-null rows. */
  def uniquenessCheck(df: DataFrame, c: String): DataFrame =
    asCheck(s"unique($c)",
      df.agg(countDistinct(col(c)).as("num"), count(col(c)).as("den")),
      (n, d) => n === d)

  /** Referential containment child.cc ⊆ parent.pc: num = child rows
    * whose key exists in the parent (left semi join), den = child rows
    * with a non-null key. Passes only at num = den.
    */
  def containmentCheck(child: DataFrame, cc: String,
                       parent: DataFrame, pc: String): DataFrame = {
    val matched = child.select(col(cc)).filter(col(cc).isNotNull)
      .join(parent.select(col(pc).as(cc)).distinct(), Seq(cc), "left_semi")
      .agg(count(lit(1)).as("num"))
    val total = child.agg(count(col(cc)).as("den"))
    asCheck(s"contained($cc)", matched.crossJoin(total), (n, d) => n === d)
  }

  /** Accepted-values check: every non-null value of `c` is in `allowed`. */
  def membershipCheck(df: DataFrame, c: String,
                      allowed: Seq[String]): DataFrame =
    asCheck(s"in_set($c)",
      df.filter(col(c).isNotNull)
        .agg(coalesce(sum(when(col(c).isin(allowed.map(x => x: Any): _*), 1L)
          .otherwise(0L)), lit(0L)).as("num"), count(lit(1)).as("den")),
      (n, d) => n === d)

  /** Numeric range check on the q4 grid: loQ ≤ round(v·10⁴) ≤ hiQ for
    * every non-null row. */
  def rangeCheck(df: DataFrame, c: String, loQ: Long, hiQ: Long): DataFrame =
    asCheck(s"range($c)",
      df.filter(col(c).isNotNull)
        .agg(coalesce(sum(when(q4(col(c)).between(loQ, hiQ), 1L)
          .otherwise(0L)), lit(0L)).as("num"), count(lit(1)).as("den")),
      (n, d) => n === d)

  /** Distribution drift between two cohorts as EXACT total-variation
    * distance over a bucketed integer column: per bucket the cross-
    * multiplied imbalance |n_a·N_b − n_b·N_a| (an exact integer — no
    * per-bucket division, so empty-on-one-side buckets need no epsilon,
    * the failure mode of PSI/KL), summed and scaled to
    * tv_ppm = 10⁶·Σ|…| div (2·N_a·N_b). The drift-monitor op between
    * snapshot generations: one map-side-combined aggregate over
    * (bucket, cohort), then arithmetic on the tiny bucket table.
    */
  def drift(df: DataFrame, valueCol: String, cohortCol: String,
            bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"drift: bucketWidth >= 1, got $bucketWidth")
    val buckets = df.select(
        (col(valueCol).cast("long") - pmod(col(valueCol).cast("long"), lit(bucketWidth)))
          .as("bucket"),
        col(cohortCol).cast("long").as("cohort"))
      .groupBy("bucket")
      .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("cohort") =!= 0, 1L).otherwise(0L)).as("n_b"))
    val totals = buckets.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    val cross = buckets.crossJoin(broadcast(totals))
      .withColumn("imbalance",
        abs(col("n_a").cast("decimal(38,0)") * col("tot_b") -
          col("n_b").cast("decimal(38,0)") * col("tot_a")))
    val tv = cross.agg(sum("imbalance").as("imb_sum"),
        max("tot_a").as("ta"), max("tot_b").as("tb"))
      .select(expr(
        "CAST(CAST(imb_sum AS DECIMAL(38,0)) * 1000000 div " +
          "(2 * CAST(ta AS DECIMAL(38,0)) * tb) AS BIGINT)").as("tv_ppm"))
    cross.crossJoin(broadcast(tv))
      .select(col("bucket"), col("n_a"), col("n_b"),
        // < 2^63 whenever each cohort holds < ~2^31 rows — the compare
        // itself stayed in Decimal
        col("imbalance").cast("long").as("imbalance"), col("tv_ppm"))
  }
}
