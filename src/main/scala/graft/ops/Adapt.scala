package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Size-adaptive partitioning for the materialization points (persist /
  * localCheckpoint) inside iterative operators.
  *
  * Cached frames and checkpointed RDDs PIN whatever partition count their
  * plan produced — AQE's runtime coalescing does not reach into them — so
  * a fixed-point loop over a small graph otherwise schedules
  * `spark.sql.shuffle.partitions` near-empty tasks per scan, per round
  * (measured: web_pagerank spent 8.5k tasks / 48 jobs on a 97-node graph
  * at the 256-partition session default). The counts here derive from the
  * frame's MEASURED row count, scale linearly and saturate at the
  * session's configured shuffle parallelism, so cluster jobs keep their
  * configured width at scale (nothing is tuned to the local core count)
  * while small iterative state collapses to a handful of tasks.
  */
object Adapt {

  /** Rows one task comfortably owns for narrow iterative state (graph
    * edges, (id, rank) pairs) — 2^17. Env-tunable; at the scaling_cc
    * block's 10^7 edges the derived count saturates the configured
    * parallelism, leaving that block's plans unchanged.
    */
  lazy val rowsPerTask: Long =
    sys.env.getOrElse("SPARK_GRAFT_ROWS_PER_TASK", "131072").toLong

  /** Parallelism floor: when per-row work is non-trivial (hashing,
    * array ops), a frame well below `rowsPerTask` can still be worth
    * spreading over the cluster — but only up to the cluster's actual
    * core count, and only while every task keeps >= this many rows.
    */
  lazy val minRowsPerTask: Long =
    sys.env.getOrElse("SPARK_GRAFT_MIN_ROWS_PER_TASK", "1024").toLong

  /** Size-derived partition count: scales as ceil(rows / rowsPerTask),
    * keeps at least cluster-parallelism partitions while tasks stay
    * above `minRowsPerTask` rows (compute floor), clamped to
    * [1, spark.sql.shuffle.partitions]. Both inputs are cluster- or
    * data-derived — nothing here is a local-mode constant.
    */
  def partitionsFor(df: DataFrame, rows: Long): Int =
    partitionsForRows(df.sparkSession, rows)

  /** [[partitionsFor]] without a frame in hand — same conf- and
    * data-derived count for RDD-held loop state.
    */
  def partitionsForRows(sess: org.apache.spark.sql.SparkSession, rows: Long): Int = {
    val cap = sess.sessionState.conf.numShufflePartitions
    val byBulk = (rows + rowsPerTask - 1) / rowsPerTask
    val byCompute = math.min(sess.sparkContext.defaultParallelism.toLong,
      (rows + minRowsPerTask - 1) / minRowsPerTask)
    math.max(1L, math.min(cap.toLong, math.max(byBulk, byCompute))).toInt
  }

  /** Plan-statistics-derived partition count for an INITIAL keyed persist,
    * before any exact row count exists: optimizer sizeInBytes over the
    * AQE advisory partition size, clamped to [1, conf]. The estimate
    * inherits parquet file sizes through column pruning, so it scales
    * with the actual input; the exact-count [[compact]] corrects it once
    * a count is in hand. Use where per-row work is trivial (edge prep,
    * id projections) — compute-heavy frames should take the
    * [[partitionsFor]] compute floor instead.
    */
  def partitionsForPlan(df: DataFrame): Int = {
    val sess = df.sparkSession
    val cap = sess.sessionState.conf.numShufflePartitions
    val adv = math.max(1L, sess.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((bytes / adv) + 1).min(BigInt(cap)).max(BigInt(1)).toInt
  }

  /** Partition count for a CACHED frame: a persisted plan pins its
    * pre-AQE partitioning (canChangeCachedPlanOutputPartitioning is off
    * by default), so an aggregate/distinct/window output caches at the
    * full conf-partition width and every downstream consumer re-scans
    * those near-empty tasks. Plan-stats-derived like [[partitionsForPlan]]
    * but floored at the cluster's core count so compute-heavy consumers
    * keep full width; saturates at the conf cap — a no-op at scale.
    */
  def cachePartitions(df: DataFrame): Int = {
    val sess = df.sparkSession
    val cap = sess.sessionState.conf.numShufflePartitions
    math.min(cap,
      math.max(partitionsForPlan(df), sess.sparkContext.defaultParallelism))
  }

  /** `df.repartition(partitionsForPlan(df), keys).persist()` — the
    * standard initial materialization of iterative-loop state.
    */
  def keyedPersist(df: DataFrame, keys: Column*): DataFrame = {
    val p = partitionsForPlan(df)
    (if (keys.isEmpty) df.coalesce(p) else df.repartition(p, keys: _*)).persist()
  }

  /** Spread a SMALL frame that feeds compute-heavy per-row expressions
    * (md5-family hashing, shingle assembly) across the cluster before
    * the expensive stage: AQE coalesces post-shuffle partitions by BYTES,
    * which serializes a kilobytes-sized token table onto one or two tasks
    * even when the expression work on it is seconds of CPU. For inputs
    * the optimizer estimates small, one exact count (cheap by the same
    * estimate) picks the [[partitionsFor]] compute-floor width; inputs
    * estimated past 4x the advisory partition size skip the count and
    * keep the planner's own parallelism — at corpus scale this is a
    * no-op with zero extra passes.
    */
  def computeSpread(df: DataFrame, keys: Column*): DataFrame = {
    val sess = df.sparkSession
    val adv = math.max(1L, sess.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(adv) * 4) df
    else {
      val p = partitionsFor(df, df.count())
      if (keys.isEmpty) df.repartition(p) else df.repartition(p, keys: _*)
    }
  }

  /** Bytes of (compressed, column-pruned) input one task should own when
    * spreading a small unsplittable scan — deliberately far below the
    * shuffle advisory size because the downstream work per scanned byte
    * (tokenize, shingle, k-way hashing) is orders of magnitude heavier
    * than a shuffle read.
    */
  lazy val scanSpreadBytes: Long =
    sys.env.getOrElse("SPARK_GRAFT_SCAN_SPREAD_BYTES", "65536").toLong

  /** Spread a small input scan across the cluster. A single small parquet
    * file reads as ONE partition, which serializes every narrow stage
    * chained on the scan (tokenize → shingle → hash → partial aggregate)
    * until the first shuffle; the guide's remedy is to repartition right
    * after the read. Inputs the optimizer estimates past 4x the advisory
    * partition size are returned untouched — at scale the scan already
    * has its natural parallelism and this is a no-op. Entirely
    * stats-driven: no extra job.
    */
  def spreadScan(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val adv = math.max(1L, sess.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes > BigInt(adv) * 4) df
    else {
      val p = (bytes / scanSpreadBytes + 1)
        .min(BigInt(sess.sparkContext.defaultParallelism)).max(BigInt(1)).toInt
      if (p <= 1) df else df.repartition(p)
    }
  }

  /** Spread a SMALL frame feeding a per-row-QUADRATIC stage (capped block
    * self-joins: every row meets up to capPerBlock partners, so the work
    * per row dwarfs the [[minRowsPerTask]] quota that [[computeSpread]]
    * assumes) across the full cluster width. Stats-guarded like
    * [[spreadScan]]: frames past 4× the advisory partition size keep
    * their natural parallelism — at corpus scale this is a no-op.
    */
  def quadSpread(df: DataFrame, keys: Column*): DataFrame = {
    val sess = df.sparkSession
    val adv = math.max(1L, sess.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(adv) * 4) df
    else {
      val rows = df.count()
      val p = math.max(1L,
        math.min(sess.sparkContext.defaultParallelism.toLong, rows)).toInt
      if (keys.isEmpty) df.repartition(p) else df.repartition(p, keys: _*)
    }
  }

  /** Re-persist an already-materialized cached frame at a size-derived
    * partition count (hash-keyed when `keys` are given, so keyed joins
    * against it still consume the one exchange). No-op when the derived
    * count saturates the configured parallelism — zero cost at scale; on
    * small state it trades one tiny job now for hundreds of empty tasks
    * on every later scan. Caller passes the frame's known row count.
    */
  def compact(df: DataFrame, rows: Long, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val p = partitionsFor(df, rows)
    if (p >= spark.sessionState.conf.numShufflePartitions ||
        df.rdd.getNumPartitions <= p) df
    else {
      val r = if (keys.isEmpty) df.repartition(p) else df.repartition(p, keys: _*)
      val c = r.persist()
      c.count()
      df.unpersist()
      c
    }
  }
}
