package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset selection / splitting for training pipelines (reference:
  * buteo/ai/selection.py). The reference shuffles numpy arrays in
  * memory; here every draw is a DETERMINISTIC hash of the row id —
  * reproducible on any cluster size, no shuffle of the full data for
  * the split decision itself, and SQL-mirrorable for the oracles.
  */
object Selection {

  /** md5-derived uniform [0,1) per id — matches the oracle exactly
    * (top 60 bits of md5 over the decimal id, like Dedup's md5prefix).
    */
  private def u01(idCol: Column): Column =
    (conv(substring(md5(encode(idCol.cast("string"), "UTF-8")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0 /* 2^60 */))

  /** Weighted systematic sampling (Madow 1949) — draw a training subset
    * of EXACTLY `k` copies with inclusion proportional to an integer
    * weight (token count, quality score), fully deterministically: item i
    * with cumulative weight interval [cum, cum+w) over total W receives
    *   n_copies = ⌊(cum+w)·k/W⌋ − ⌊cum·k/W⌋
    * — the number of k-grid boundaries its interval crosses. Σ n_copies
    * = k exactly (telescoping), a heavy item can legitimately earn
    * multiple copies (the up-sampling a training-mix wants), and there
    * is NO randomness to seed — reruns are bit-identical anywhere.
    *
    * Scale shape: the cumulative weights ride the same two-level
    * distributed prefix sum as [[TextOps.packSequences]] (per-bucket
    * sums + one tiny ordered window over bucket offsets + a local
    * window inside each bucket — never one global window); the total is
    * one broadcast scalar; the boundary arithmetic is per-row
    * decimal(38,0), exact up to W·k < 10³⁸. Items are ordered by
    * `doc_id` — the systematic order is part of the op's contract.
    * Zero/negative weights are excluded.
    */
  def systematicSample(df: DataFrame, k: Long, weightCol: String,
                       bucket: Long = 1L << 20): DataFrame = {
    require(k >= 1, s"systematicSample: k must be >= 1, got $k")
    require(bucket >= 1, s"systematicSample: bucket must be >= 1, got $bucket")
    val sized = df.select(col("doc_id"), col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("bkt", expr(s"doc_id DIV $bucket"))
    val wOff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy("bkt").agg(sum("w").as("bsum"))
      .withColumn("boff", coalesce(sum("bsum").over(wOff), lit(0L)))
      .select("bkt", "boff")
    val wLoc = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = sized.agg(sum("w").as("tw"))
    sized.join(offsets, "bkt")
      .withColumn("cum0", col("boff") + coalesce(sum("w").over(wLoc), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("n_copies", expr(
        s"""(CAST(cum0 + w AS DECIMAL(38,0)) * $k) div tw
            - (CAST(cum0 AS DECIMAL(38,0)) * $k) div tw"""))
      .filter(col("n_copies") >= 1)
      .select("doc_id", "w", "n_copies")
  }

  /** split_train_val (reference selection.py:11-69): adds a `split`
    * column ("train"/"val") by deterministic hash threshold.
    */
  def splitTrainVal(df: DataFrame, idCol: String, valSize: Double = 0.2): DataFrame =
    df.withColumn("split",
      when(u01(col(idCol)) < lit(1.0 - valSize), "train").otherwise("val"))

  /** split_train_val_test (reference selection.py:70-140): three-way
    * deterministic split.
    */
  def splitTrainValTest(df: DataFrame, idCol: String,
                        valSize: Double = 0.1, testSize: Double = 0.1): DataFrame = {
    val u = u01(col(idCol))
    df.withColumn("split",
      when(u < lit(1.0 - valSize - testSize), "train")
        .when(u < lit(1.0 - testSize), "val")
        .otherwise("test"))
  }

  /** sampling_stratified (reference selection.py:141-199): equal
    * samples per class — `samplesPerClass` if given, else the smallest
    * class size. Selection order is the deterministic hash (the
    * reference's shuffle analog), via one window per class.
    */
  def samplingStratified(df: DataFrame, idCol: String, classCol: String,
                         samplesPerClass: Int = -1): DataFrame = {
    val n =
      if (samplesPerClass > 0) lit(samplesPerClass)
      else {
        val minClass = df.groupBy(classCol).count()
          .agg(min("count")).collect()(0).getLong(0)
        lit(minClass)
      }
    val w = Window.partitionBy(classCol).orderBy(u01(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** sampling_random (reference selection.py:200-): deterministic
    * Bernoulli(p) by id hash.
    */
  def samplingRandom(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(u01(col(idCol)) < lit(fraction))

  /** Rebalance the corpus to a target class mixture — the data-mixing
    * step of training-corpus assembly (e.g. language rebalancing): with
    * class counts n_c and target shares t_c, the largest achievable
    * mixed corpus is M = min_c n_c / t_c and each class keeps with
    * probability p_c = M·t_c / n_c (≤ 1 by construction), drawn as the
    * deterministic md5 hash of the row id. Classes absent from
    * `targets` are dropped. Planning cost is one class-count aggregate
    * (#classes rows on the driver — legitimate); the decision itself is
    * a broadcast join of per-class keep rates plus a map-side filter, so
    * nothing reshuffles at corpus scale and the sample is reproducible
    * at any parallelism.
    */
  def sampleToMix(df: DataFrame, idCol: String, classCol: String,
                  targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0),
      "targets must be positive shares")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(classCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targets.toSeq.filter { case (c, _) => counts.contains(c) }.sortBy(_._1)
    require(present.nonEmpty, "no target class present in the data")
    val m = present.map { case (c, t) => counts(c) / t }.min
    val rates = present.map { case (c, t) => (c, m * t / counts(c)) }
    df.join(broadcast(rates.toDF(classCol, "keep_p")), classCol)
      .filter(u01(col(idCol)) < col("keep_p"))
  }

  /** Deterministic per-group uniform sample: the k rows with the
    * smallest `hash60(key)` per group (bottom-k of a hash IS a uniform
    * sample without replacement, and — unlike reservoir sampling — is
    * order-free, mergeable, and replayable). Spark plans the rank
    * filter as WindowGroupLimit: partial bottom-k below the exchange,
    * so a 10⁹-row group never sorts globally. Ties (hash collisions)
    * break on the key itself — a total order, so the sample is
    * bit-stable at any parallelism.
    */
  def hashSample(df: DataFrame, keyCol: String, groupCols: Seq[String],
                 k: Int, family: String = "xxhash64"): DataFrame = {
    require(k >= 1, s"hashSample: k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("sample_h"), col(keyCol))
    df.withColumn("sample_h", Sketches.hash60(col(keyCol), family))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("sample_h", "sample_rank")
  }

  /** Greedy k-center selection (Gonzalez 1985 farthest-point traversal —
    * the 2-approximation coreset a diversity-driven training-data
    * selector runs over an embedding table): start from the lowest
    * vec_id, then k−1 times pick the point farthest from every chosen
    * center (ties → lowest id). Distances are EXACT integer squared L2
    * over the ×1000-quantized vectors, so the traversal is bit-identical
    * at any parallelism. Returns (round, vec_id, radius2) — radius2 is
    * the selected point's distance² at selection time, the monotone
    * nonincreasing covering-radius certificate.
    *
    * Scale shape: k map-side-combined max(struct) aggregations over a
    * once-cached quantized table; centers travel driver→executor as one
    * 64-long array each round. Never a shuffle of the corpus.
    */
  def kCenters(embeddings: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val q = embeddings
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .persist()
    // fused dist2 kernel: the round's center rides a literal that codegen
    // carries as a reference object, so every Gonzalez round reuses the
    // same compiled source (the aggregate(zip_with(.., lit(center), ..))
    // form re-generated and re-compiled per round); same fold order and
    // exact Long arithmetic
    def d2To(center: Array[Long]): Column =
      call_function("dist2_long", col("q"), typedlit(center.toSeq))
    try {
      val first = q.orderBy("vec_id").head()
      val out = collection.mutable.ArrayBuffer((0, first.getLong(0), 0L))
      var cur = q.withColumn("mind2", d2To(first.getSeq[Long](1).toArray))
      for (r <- 1 until k) {
        val best = cur
          .agg(max(struct(col("mind2"), (-col("vec_id")).as("nid"),
            col("q"))).as("b"))
          .head().getStruct(0)
        out += ((r, -best.getLong(1), best.getLong(0)))
        if (r < k - 1)
          cur = cur.withColumn("mind2",
            least(col("mind2"), d2To(best.getSeq[Long](2).toArray)))
      }
      out.toSeq.toDF("round", "vec_id", "radius2")
    } finally q.unpersist()
  }
}
