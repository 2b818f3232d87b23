package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus accounting at crawl scale —
  * approximate distinct counts (URLs per host, hosts per cell, tokens per
  * shard) where an exact `count(DISTINCT …)` would shuffle the full key
  * universe. The engine's exact salted count-distinct
  * (`geo_cell_distinct_salted`) stays the right tool when exactness is
  * required; the sketch is the right tool when 10¹² keys must fold into
  * kilobytes per group.
  *
  * The HyperLogLog implementation (Flajolet et al. 2007) is DETERMINISTIC
  * by construction: registers are derived from a fixed hash family, and
  * every combining step is a max / integer sum — order-independent and
  * parallelism-independent, so register tables and the integer summary
  * are bit-exact against a SQL oracle (the float estimate is one final
  * division from exact integers). Register max is associative and
  * commutative, which is the 100-TB property: per-partition sketches
  * merge map-side, daily sketches merge across snapshots, and no stage
  * ever sees raw keys after the first map pass.
  */
object Sketches {

  /** 60-bit non-negative hash of `key` under the shared two-family
    * convention: "xxhash64" (production — one codegen'd hash, top 60
    * bits) or "md5prefix" (oracle mirror — first 15 hex chars of md5,
    * `CAST('0x' || substr(md5(k),1,15) AS BIGINT)` on the SQL side).
    */
  private[graft] def hash60(key: Column, family: String): Column = family match {
    case "xxhash64" => shiftrightunsigned(xxhash64(key), 4)
    case "md5prefix" =>
      conv(substring(md5(encode(key.cast("string"), "UTF-8")), 1, 15), 16, 10)
        .cast("long")
    case other => throw new IllegalArgumentException(
      s"hll: unknown hash family '$other' (xxhash64 | md5prefix)")
  }

  /** HyperLogLog register table: one row per (group, non-empty register)
    * with the register's max rank. `p` index bits → m = 2^p registers;
    * rank = leading-zero count of the (60−p)-bit hash suffix + 1
    * (∈ [1, 61−p]; an all-zero suffix takes the max). Empty registers
    * are implicit (rank 0) — the summary reconstructs them from m, so
    * the table stays sparse for small groups.
    *
    * Plan shape: one map-only projection (hash → bucket split → rank via
    * a codegen'd binary-string length) + ONE hash aggregation on
    * (group, register) with map-side combine — a hot group costs its
    * reducer at most m merged partials, never raw keys. Register tables
    * from different shards union + re-max into a valid merged sketch.
    */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
                   p: Int = 9, family: String = "xxhash64"): DataFrame = {
    require(p >= 4 && p <= 16, s"hll: p must be in [4, 16], got $p")
    val m = 1L << p
    val suffix = 60 - p
    val h = hash60(col(keyCol), family)
    val rest = shiftrightunsigned(h, p)
    // bit length of the suffix via decimal→binary string conv — exact,
    // codegen'd, and replayable in SQL as length(to_base(rest, 2))
    val rank = when(rest === 0L, lit(suffix + 1))
      .otherwise(lit(suffix + 1) - length(conv(rest.cast("string"), 10, 2)))
    df.select(groupCols.map(col) :+
        h.bitwiseAND(lit(m - 1)).as("reg_no") :+ rank.as("rank"): _*)
      .groupBy(groupCols.map(col) :+ col("reg_no"): _*)
      .agg(max(col("rank")).cast("int").as("reg"))
  }

  /** Integer sketch summary per group from a register table:
    * `nonzero` = occupied registers, `zeros` = m − nonzero, and
    * `zint` = Σ_j 2^(R − M_j) over ALL m registers (R = 61−p the max
    * rank, empty registers at rank 0) as decimal(38,0) — the exact
    * integer form of HLL's indicator Z = zint / 2^R. Everything is a
    * max/sum of integers: bit-exact at any parallelism and in SQL.
    */
  def hllSummary(registers: DataFrame, groupCols: Seq[String],
                 p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"hll: p must be in [4, 16], got $p")
    val m = 1L << p
    val maxRank = 61 - p
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("nonzero"),
        sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $maxRank - reg) AS DECIMAL(38,0))"))
          .as("znon"))
      .select(groupCols.map(col) :+
        col("nonzero") :+
        (lit(m) - col("nonzero")).as("zeros") :+
        (col("znon") +
          (lit(m) - col("nonzero")).cast("decimal(38,0)") *
            lit(1L << maxRank).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("zint"): _*)
  }

  /** Per-row depth-d bucket under the shared two-family convention
    * (seeded like Dedup.permHash: seed d prepended). pmod absorbs
    * xxhash64's sign.
    */
  private def cmsBucket(d: Int, key: Column, width: Int,
                        family: String): Column = family match {
    case "xxhash64" => pmod(xxhash64(lit(d), key), lit(width.toLong))
    case "md5prefix" =>
      pmod(conv(substring(md5(encode(concat(lit(s"$d:"), key.cast("string")),
        "UTF-8")), 1, 15), 16, 10).cast("long"), lit(width.toLong))
    case other => throw new IllegalArgumentException(
      s"cms: unknown hash family '$other' (xxhash64 | md5prefix)")
  }

  /** Count-Min sketch registers (Cormode & Muthukrishnan 2005): a
    * depth × width counter matrix per group — the mergeable frequency
    * sketch for heavy-hitter accounting when the exact per-key count
    * table (10¹² distinct tokens/URLs) is itself too large to keep.
    * Point estimates ([[cmsEstimate]]) overestimate by at most
    * 2·N/width with probability 1 − 2^−depth and never underestimate.
    *
    * Determinism/mergeability: counters are SUMS over fixed hash
    * buckets — order-independent, parallelism-independent, shard
    * sketches merge by bucket-wise addition, and a SQL oracle replays
    * them exactly. Plan shape: ONE scan (the depth buckets ride a
    * posexplode'd array, not depth re-scans) + one map-side-combined
    * aggregation whose reducer state is bounded by groups × depth ×
    * width. Empty buckets are implicit zeros.
    */
  def cmsRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
                   width: Int = 256, depth: Int = 4,
                   family: String = "xxhash64"): DataFrame = {
    require(width >= 2 && width <= (1 << 24),
      s"cms: width must be in [2, 2^24], got $width")
    require(depth >= 1 && depth <= 16, s"cms: depth must be in [1, 16], got $depth")
    val buckets = array((0 until depth)
      .map(d => cmsBucket(d, col(keyCol), width, family)): _*)
    df.select(groupCols.map(col) :+ posexplode(buckets).as(Seq("d", "b")): _*)
      .groupBy(groupCols.map(col) :+ col("d") :+ col("b"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min point estimates: for each probe key, min over the depth
    * rows of its bucket counters (absent counter = 0). One left
    * equi-join per probe stream against the register table + one
    * min-aggregation — probes never touch the raw corpus.
    */
  def cmsEstimate(registers: DataFrame, probes: DataFrame, keyCol: String,
                  groupCols: Seq[String], width: Int = 256, depth: Int = 4,
                  family: String = "xxhash64"): DataFrame = {
    val buckets = array((0 until depth)
      .map(d => cmsBucket(d, col(keyCol), width, family)): _*)
    val pb = probes.select(
      (groupCols.map(col) :+ col(keyCol)) :+
        posexplode(buckets).as(Seq("d", "b")): _*)
    pb.join(registers, groupCols :+ "d" :+ "b", "left")
      .groupBy(groupCols.map(col) :+ col(keyCol): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** KMV (k minimum values / bottom-k) distinct sketch, Bar-Yossef et al.
    * 2002: the k smallest DISTINCT 60-bit key hashes per group, as rows
    * (group…, slot ∈ [1,k], hv). The third cardinality tool next to HLL
    * (smaller state, float estimate) and the salted exact count-distinct
    * (exact, key-universe shuffle): KMV's register table doubles as a
    * uniform key sample, shards merge by "union, re-rank, keep bottom k",
    * and — because the bottom-k of a SET is order-free — the whole
    * sketch AND its estimate are exact integer arithmetic, bit-identical
    * at any parallelism and in SQL.
    *
    * Plan shape: map projection → one hash-dedup agg on (group, hv) with
    * map-side combine → a rank-≤-k window that Spark rewrites to
    * WindowGroupLimit, so every partition pre-trims to its local
    * bottom-k below the exchange; a 10¹²-key group never materializes
    * more than k rows per partition past the dedup.
    */
  def kmvRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
                   k: Int = 64, family: String = "xxhash64"): DataFrame = {
    require(k >= 2 && k <= 65536, s"kmv: k must be in [2, 65536], got $k")
    val hashes = df
      .select(groupCols.map(col) :+ hash60(col(keyCol), family).as("hv"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("hv"))
    hashes.withColumn("slot", row_number().over(w))
      .filter(col("slot") <= k)
      .select(groupCols.map(col) :+ col("slot").cast("int").as("slot") :+ col("hv"): _*)
  }

  /** Exact-integer KMV estimate per group: when the group holds fewer
    * than k distinct hashes the sketch IS the set (est = n_slots,
    * exact); otherwise est = ⌊(k−1)·2^60 / h_(k)⌋ — one integer
    * division, no floats anywhere.
    */
  def kmvEstimate(registers: DataFrame, groupCols: Seq[String],
                  k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 65536, s"kmv: k must be in [2, 65536], got $k")
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_slots"),
        max(when(col("slot") === k, col("hv"))).as("kth"))
      .select(groupCols.map(col) :+ col("n_slots") :+ col("kth") :+
        when(col("n_slots") < k, col("n_slots"))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * ${1L << 60} DIV kth AS BIGINT)"))
          .as("est"): _*)
  }

  /** Distinct-count estimate per group: the raw HLL estimator
    * α_m·m²·2^R / zint with the standard small-range linear-counting
    * correction (zeros > 0 and raw ≤ 2.5m → m·ln(m/zeros)). The only
    * non-integer steps are one division and (in the small branch) one
    * `ln` — deterministic on a given JVM; the hash-exact artifacts are
    * [[hllRegisters]]/[[hllSummary]], this is the human-facing number.
    */
  def hllEstimate(summary: DataFrame, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"hll: p must be in [4, 16], got $p")
    val m = (1L << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val maxRank = 61 - p
    val raw = lit(alpha * m * m * math.pow(2.0, maxRank)) /
      col("zint").cast("double")
    val est = when(col("zeros") > 0 && raw <= lit(2.5 * m),
        lit(m) * log(lit(m) / col("zeros").cast("double")))
      .otherwise(raw)
    summary.withColumn("est", est)
  }

  // ------------------------------------------------- Misra–Gries heavy hitters

  /** Misra–Gries candidate summary over `keyCol`: a typed Aggregator with
    * a k-slot counter map, per-partition partials merged with the
    * count-sum + (k+1)-th-largest-subtraction rule of Agarwal et al. 2012
    * ("Mergeable summaries"), which preserves the MG guarantee: every key
    * with true count f satisfying f·(k+1) > N survives the merged summary
    * (undercount ≤ N/(k+1)). State is ≤ k counters regardless of key
    * cardinality — the property that matters when the key universe is
    * 10¹² tokens and an exact groupBy would shuffle all of it.
    *
    * The candidate SET depends on merge order (only the guarantee is
    * order-free), so this is never a gate artifact by itself —
    * [[heavyHitters]] recounts candidates exactly and filters on the
    * exact threshold, making the final output deterministic at any
    * parallelism. Sketch-prefilter + exact-verify, the geo_cover_pip
    * adjudication applied to frequency.
    */
  def mgCandidates(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"mg: k must be >= 1, got $k")
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.Encoder
    val agg = new org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], key: String): Map[String, Long] =
        b.get(key) match {
          case Some(c) => b.updated(key, c + 1)
          case None if b.size < k => b.updated(key, 1L)
          case None => // decrement-all; drop zeros (classic MG step)
            b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        }
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (m, (key, c)) =>
          m.updated(key, m.getOrElse(key, 0L) + c)
        }
        if (sum.size <= k) sum
        else {
          val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.view.mapValues(_ - kth).filter(_._2 > 0).toMap
        }
      }
      def finish(r: Map[String, Long]): Map[String, Long] = r
      def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
      def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    }
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).na.drop().as[String]
      .select(agg.toColumn).toDF("summary")
      .select(explode(col("summary")).as(Seq("key", "est")))
  }

  /** Exact heavy hitters via the MG prefilter: keys with
    * count·(k+1) > N, strict. One MG pass (bounded state, map-side
    * combined) finds ≤ k candidates; one recount pass groups every row
    * under its candidate key or a single `null` bucket, so the exact
    * threshold and the exact counts come out of the same aggregate.
    * Non-candidates collapse into one combiner cell per task — no key
    * explosion, no skew, and the MG guarantee makes the prefilter
    * lossless, so the result is exactly the true heavy-hitter set.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val cands = mgCandidates(df, keyCol, k).collect().map(_.getString(0)).toSeq
    val ck = when(col(keyCol).isin(cands: _*), col(keyCol))
    val counts = df.na.drop(Seq(keyCol))
      .groupBy(ck.as("key")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    counts.where(col("key").isNotNull)
      .crossJoin(broadcast(total))
      .where(col("cnt") * (k + 1) > col("total"))
      .select(col("key"), col("cnt"), col("total"))
  }
}
