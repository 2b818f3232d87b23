package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-based decision-tree primitives — the split-finding step of
  * histogram GBDT (LightGBM / XGBoost `hist`), which is THE way tree
  * training scales on Spark: features pre-bucket to B integer bins, so
  * split finding collapses to ONE map-side-combined (feature, bin)
  * class-count aggregation over the data (the only pass that touches
  * rows), and everything after runs on the ≤ F·B histogram rows.
  */
object Trees {

  /** Train a depth-1 tree (decision stump) with EXACT Gini: the best
    * split minimizes I(s) = nL·gini(L) + nR·gini(R), equivalently
    * maximizes a/b with a = (Σc cL²)·nR + (Σc cR²)·nL and b = nL·nR.
    * Candidates are compared by cross-multiplication in Decimal(38,0)
    * via a dominance anti join over the tiny candidate table — no FP
    * division anywhere, ties broken (feature, bin) lexicographic, so
    * the chosen split is deterministic at any parallelism and
    * SQL-oracle-exact. (Decimal(38) holds a·b up to N ≈ 3·10⁷ labeled
    * rows; beyond that swap the certificate to a wider type — the
    * histogram pass itself is unbounded.)
    *
    * `labelCol` must be 0/1; `features` are integral columns. Bin b of
    * feature f covers (value − min)·bins div (max − min + 1) = b; the
    * split predicate is `bin ≤ b` (left) vs `bin > b` (right).
    * Returns the single winning row with the bin histogram counts, the
    * (a, b) certificate, and the feature's (vmin, vmax) so callers can
    * reconstruct the numeric threshold.
    */
  def stump(rows: DataFrame, labelCol: String, features: Seq[String],
            bins: Int = 16): DataFrame = {
    require(features.nonEmpty, "stump: need at least one feature")
    require(bins >= 2 && bins <= 4096, s"stump: bins in [2, 4096], got $bins")
    val stackExpr = s"stack(${features.size}, " +
      features.map(f => s"'$f', $f").mkString(", ") + ") AS (feature, value)"
    val melted = rows.select(col(labelCol).cast("long").as("label"),
      expr(stackExpr)).filter(col("value").isNotNull)
    val ranges = melted.groupBy("feature")
      .agg(min("value").as("vmin"), max("value").as("vmax"))
    val hist = melted.join(broadcast(ranges), "feature")
      .withColumn("bin",
        expr(s"CAST((value - vmin) * $bins DIV (vmax - vmin + 1) AS INT)"))
      .groupBy("feature", "bin")
      .agg(sum(when(col("label") === 0L, 1L).otherwise(0L)).as("c0"),
        sum(when(col("label") =!= 0L, 1L).otherwise(0L)).as("c1"))
    val wOrd = Window.partitionBy("feature").orderBy("bin")
    val wAll = Window.partitionBy("feature")
    val cand = hist
      .withColumn("c0l", sum("c0").over(wOrd))
      .withColumn("c1l", sum("c1").over(wOrd))
      .withColumn("ct0", sum("c0").over(wAll))
      .withColumn("ct1", sum("c1").over(wAll))
      .withColumn("nl", col("c0l") + col("c1l"))
      .withColumn("nr", col("ct0") + col("ct1") - col("nl"))
      .filter(col("nl") > 0 && col("nr") > 0)
      .withColumn("c0r", col("ct0") - col("c0l"))
      .withColumn("c1r", col("ct1") - col("c1l"))
      .withColumn("a", expr("""CAST(
          (CAST(c0l AS DECIMAL(38,0)) * c0l + CAST(c1l AS DECIMAL(38,0)) * c1l) * nr
        + (CAST(c0r AS DECIMAL(38,0)) * c0r + CAST(c1r AS DECIMAL(38,0)) * c1r) * nl
        AS DECIMAL(38,0))"""))
      .withColumn("b",
        expr("CAST(CAST(nl AS DECIMAL(38,0)) * nr AS DECIMAL(38,0))"))
      .select(col("feature"), col("bin"), col("nl"), col("nr"),
        col("c0l"), col("c1l"), col("c0r"), col("c1r"), col("a"), col("b"))
    val dom = cand.select(col("feature").as("df"), col("bin").as("dbin"),
      col("a").as("da"), col("b").as("db"))
    cand
      .join(broadcast(dom),
        (col("da") * col("b") > col("a") * col("db")) ||
          ((col("da") * col("b") === col("a") * col("db")) &&
            (col("df") < col("feature") ||
              (col("df") === col("feature") && col("dbin") < col("bin")))),
        "left_anti")
      .join(broadcast(ranges), "feature")
  }
}
