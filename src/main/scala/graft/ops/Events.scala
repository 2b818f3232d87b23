package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table. Time is handled as
  * integer microseconds (`unix_micros` / DuckDB `epoch_us`) for exact
  * cross-engine parity; money-ish doubles are quantized per-row before
  * integer summing so aggregation order can't leak ulps.
  *
  * The same transforms run under Structured Streaming (readStream +
  * watermark on ts); see graft.streaming.
  */
object Events {

  /** Tumbling 1-hour windows per event type: counts + exact value sums
    * (value quantized to cents per row).
    */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("win", floor(col("us") / lit(3600000000L)))
      .withColumn("cents", round(col("value") * lit(100.0)).cast("long"))
      .groupBy("win", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_sum"),
        min("event_id").as("min_ev"), max("event_id").as("max_ev"))

  /** Ordered funnel analysis — how many users progressed through the
    * step sequence IN TIME ORDER (step k counts only events at or after
    * the user's reach-time of step k−1; first-touch semantics). The
    * classic product-analytics query, exact: reach times are integer
    * microsecond minima with (us, event_id) unavailable ties broken by
    * min over the full event set — min is order-free, so the funnel is
    * parallelism-independent and SQL-mirrorable.
    *
    * Scale shape: one filtered map-side-combined min-agg per step plus
    * one user-keyed equi-join per step transition — k steps cost k aggs
    * + (k−1) joins, all on user_id, never a window over the raw stream.
    * Returns one row per step: (step_no, step, n_users, conv_ppm) where
    * conv_ppm = ⌊n_k·10⁶ / n_{k−1}⌋ (10⁶ for step 1).
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel: need >= 2 steps, got ${steps.size}")
    val spark = events.sparkSession
    import spark.implicits._
    val us = unix_micros(col("ts").cast("timestamp"))
    val base = events.select(col("user_id"), col("event_type"), us.as("us"))
    var reached = base.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("us")).as("t"))
    var counts = Vector(reached.count())
    for (s <- steps.tail) {
      reached = base.filter(col("event_type") === s)
        .join(reached.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .filter(col("us") >= col("t_prev"))
        .groupBy("user_id").agg(min(col("us")).as("t"))
      counts :+= reached.count()
    }
    steps.zipWithIndex.map { case (s, i) =>
      val conv = if (i == 0) 1000000L
      else if (counts(i - 1) == 0L) 0L
      else counts(i) * 1000000L / counts(i - 1)
      (i + 1, s, counts(i), conv)
    }.toDF("step_no", "step", "n_users", "conv_ppm")
  }

  /** Sessionization: per-user event gaps > 30 minutes start a new session.
    * Returns per-user session/event counts. Window over (user, time) —
    * the shuffle is on user_id; state is O(1) per row (lag).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev", lag("us", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Top-k session paths — the product-analytics "user flow" report:
    * per session (same 30-min-gap rule as [[sessionize]]) the ordered
    * event-type sequence, truncated to `maxSteps`, joined with '>' and
    * counted across the corpus. Order inside a session is total
    * ((ts, event_id)), and collect_list's nondeterministic arrival order
    * is repaired by array_sort on the unique step index — the output is
    * bit-identical at any parallelism. The per-session state is bounded
    * by maxSteps; the path table is tiny, so the global top-k is a
    * TakeOrdered, never a full sort.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
                   maxSteps: Int = 5, topK: Int = 20): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val bySess = Window.partitionBy("user_id", "sess_id")
      .orderBy(col("us"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev", lag("us", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(byUser))
      .withColumn("step", row_number().over(bySess))
      .filter(col("step") <= maxSteps)
      .groupBy("user_id", "sess_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("step"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Rolling distinct active users — the DAU/WAU pair, EXACT: the raw
    * stream collapses to distinct user-days first, then each user-day
    * fans out to the `windowDays` trailing report days (bounded 7×
    * expansion — the standard exact-sliding-distinct shape; never a
    * distinct over a window). Days past the corpus maximum are cut by
    * one broadcast scalar. Output (day, dau, wau).
    */
  def activeUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val days = events
      .select(col("user_id"), floor(us / lit(86400000000.0)).cast("long").as("day"))
      .distinct()
    val maxDay = days.agg(max("day").as("max_day"))
    val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = days
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1))).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    // left from the WAU side: a day with no direct events still reports
    // its trailing-window actives (dau = 0)
    wau.join(dau, Seq("day"), "left")
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_day"))
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
  }

  /** Cohort retention: users grouped by their first active day (the
    * cohort); for each (cohort_day, day_offset) the number of cohort
    * members active that day plus the retention rate in exact ppm
    * (⌊n_active·10⁶ / cohort_n⌋ — integer division, parallelism-free).
    *
    * Scale shape: the raw event stream collapses to distinct user-days
    * FIRST (one map-side-combined agg), so everything after runs on
    * user-days, not events; cohort sizes are a tiny frame joined back at
    * the end. No window over the raw stream.
    */
  def retention(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val days = events
      .select(col("user_id"), floor(us / lit(86400000000.0)).as("day"))
      .distinct()
    val first = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = first.groupBy("cohort_day").agg(count(lit(1)).as("cohort_n"))
    days.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        expr("CAST(n_active * 1000000 DIV cohort_n AS BIGINT)").as("ret_ppm"))
  }

  /** Trailing-window rate anomaly: each (event_type, hour) bucket's count
    * against the SUM of the previous `windowHours` hourly buckets — the
    * live traffic-spike / outage detector. spike_ppm =
    * ⌊n·windowHours·10⁶ / prev_sum⌋ (10⁶ = exactly the trailing average;
    * null when the trailing window is empty) — exact integer, and the
    * RANGE frame is over the integer hour so missing hours weigh zero
    * without gap-filling.
    *
    * Scale shape: the raw stream folds to hourly buckets first (one
    * map-side-combined agg); the window then runs on |types|×|hours|
    * rows, not events.
    */
  def hourlyAnomaly(events: DataFrame, windowHours: Int = 24): DataFrame = {
    require(windowHours >= 1, s"hourlyAnomaly: windowHours must be >= 1, got $windowHours")
    val us = unix_micros(col("ts").cast("timestamp"))
    val hourly = events
      .withColumn("hour", floor(us / lit(3600000000.0)))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy(col("hour"))
      .rangeBetween(-windowHours, -1)
    hourly
      .withColumn("prev_sum", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("prev_hours", count(lit(1)).over(w))
      .select(col("event_type"), col("hour"), col("n"), col("prev_sum"), col("prev_hours"),
        when(col("prev_sum") === 0, lit(null).cast("long"))
          .otherwise(expr(s"CAST(n * $windowHours * 1000000 DIV prev_sum AS BIGINT)"))
          .as("spike_ppm"))
  }

  /** Bot-cadence detection: humans are bursty, schedulers are regular —
    * so the variance-to-mean ratio of a user's inter-event gaps (in
    * seconds) is the classic signal. Both moments are exact integer
    * sums (`vmr_milli = 10³·(n·Σg² − (Σg)²) div (n·Σg)`, Decimal(38)
    * products), users under `minEvents` are skipped, and the verdict
    * `regular` fires below `maxVmrMilli`. One user-ordered window (lag)
    * sharing its exchange with the per-user agg.
    */
  def botCadence(events: DataFrame, minEvents: Long = 5,
                 maxVmrMilli: Long = 200): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gaps = events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("user_id"),
        expr("CAST((us - prev_us) DIV 1000000 AS BIGINT)").as("g"))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sum_g"),
        sum(col("g") * col("g")).as("sum_g2"))
      .filter(col("n_gaps") >= minEvents - 1 && col("sum_g") > 0)
      .withColumn("vmr_milli", expr("""CAST(
          (1000 * (CAST(n_gaps AS DECIMAL(38,0)) * sum_g2
                   - CAST(sum_g AS DECIMAL(38,0)) * sum_g))
          DIV (CAST(n_gaps AS DECIMAL(38,0)) * sum_g) AS BIGINT)"""))
      .withColumn("regular", col("vmr_milli") < lit(maxVmrMilli))
  }

  /** Seasonal-naive forecast evaluation — the baseline every real
    * forecasting pipeline is judged against: predict each hour's count
    * with the count one period earlier and report the exact absolute
    * error. The period shift is a SELF-JOIN on (type, hour − period),
    * not a window lag — lag would silently read the previous PRESENT
    * hour across gaps in the sparse grid. All integers:
    * mae_milli = 10³·Σ|err| div n.
    */
  def seasonalNaiveError(events: DataFrame, periodHours: Long = 24L): DataFrame = {
    require(periodHours >= 1, s"periodHours >= 1, got $periodHours")
    val us = unix_micros(col("ts").cast("timestamp"))
    val hourly = events
      .withColumn("hour", floor(us / lit(3600000000.0)))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
    val actual = hourly.select(col("event_type"), col("hour"), col("n"))
    val forecast = hourly.select(col("event_type"),
      (col("hour") + lit(periodHours)).as("hour"), col("n").as("n_pred"))
    actual.join(forecast, Seq("event_type", "hour"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("n") - col("n_pred"))).as("sum_abs_err"),
        sum(col("n")).as("sum_actual"))
      .withColumn("mae_milli",
        expr("CAST(sum_abs_err * 1000 DIV n_hours AS BIGINT)"))
  }

  /** Semi-structured property extraction + rollup: pull a typed field
    * out of the JSON `props` column (codegen'd path extraction, no UDF,
    * identical '$.k' semantics in Spark's get_json_object and DuckDB's
    * json_extract_string) and aggregate it per event type — the
    * schema-on-read pattern every event pipeline needs before the JSON
    * is promoted to a real column. One map-side-combined agg.
    */
  def jsonPropStats(events: DataFrame, path: String = "$.k"): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), path).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_with_k"),
        countDistinct(col("k")).as("n_distinct"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))

  /** Two-proportion A/B test as an exact integer certificate: variant =
    * user_id mod 2, conversion = the user fired `convType` at least
    * once. The 2×2 chi-square χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))
    * is carried as its exact (num, den) pair in Decimal(38), and the
    * α = 0.05 verdict (χ² ≥ 3.841459) is decided by cross-multiplication
    * — no FP, so the verdict is order-free and oracle-exact. (Decimal
    * headroom: num ≤ N⁵ ⇒ exact to N ≈ 3·10⁷ users; beyond, widen.)
    * Two distinct-aggs on user_id — count-distinct partials keep the
    * shuffle narrow.
    */
  def abTest(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val perUser = events
      .groupBy((pmod(col("user_id"), lit(2))).as("variant"), col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L)).as("conv"))
    val cells = perUser.groupBy("variant")
      .agg(count(lit(1)).as("users"), sum(col("conv")).as("converted"))
    val a = cells.filter(col("variant") === 0)
      .select(col("users").as("users_a"), col("converted").as("conv_a"))
    val b = cells.filter(col("variant") === 1)
      .select(col("users").as("users_b"), col("converted").as("conv_b"))
    a.crossJoin(broadcast(b))
      .withColumn("chi2_num", expr("""CAST(
        (users_a + users_b) *
        CAST(conv_a * (users_b - conv_b) - conv_b * (users_a - conv_a) AS DECIMAL(38,0)) *
        CAST(conv_a * (users_b - conv_b) - conv_b * (users_a - conv_a) AS DECIMAL(38,0))
        AS DECIMAL(38,0))"""))
      .withColumn("chi2_den", expr("""CAST(
        CAST(users_a AS DECIMAL(38,0)) * users_b *
        (conv_a + conv_b) * (users_a + users_b - conv_a - conv_b)
        AS DECIMAL(38,0))"""))
      .withColumn("significant",
        col("chi2_num") * lit(1000000L) >= col("chi2_den") * lit(3841459L))
  }

  /** Slowly-changing-dimension type-2 build (the warehouse dimension
    * pattern): from a change log of (key, ts, value) observations,
    * collapse consecutive duplicates and emit one validity interval per
    * surviving change — effective_from = its ts, effective_to = the NEXT
    * change's ts (null while current), version = change ordinal.
    * Three window functions sharing ONE (key, time-ordered) exchange;
    * ties on ts break by `ordCol` so the interval chain is total-ordered
    * and deterministic.
    */
  def scd2(log: DataFrame, keyCol: String, tsCol: String, valCol: String,
           ordCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(ordCol))
    val changes = log
      .withColumn("prev_v", lag(col(valCol), 1).over(w))
      .filter(col("prev_v").isNull || col("prev_v") =!= col(valCol))
    changes
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col(keyCol), col(valCol),
        col(tsCol).as("effective_from"), col("effective_to"),
        col("version").cast("long").as("version"),
        col("effective_to").isNull.as("is_current"))
  }

  /** Hour-of-day × event-type rollup (GROUPING SETS surface): exact
    * counts and q4 value sums at (type, hour), (type), and grand-total
    * grain, with NULL group markers coalesced to sentinels ('ALL' / −1)
    * so every row is totally keyed. One rollup aggregation —
    * Spark expands grouping sets below the exchange, keeping map-side
    * combine.
    */
  def hourTypeRollup(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("hod", (floor(us / lit(3600000000.0)) % 24).cast("int"))
      .withColumn("vq", round(col("value") * lit(10000.0)).cast("long"))
      .rollup(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"), sum(col("vq")).as("value_q"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("hod"), lit(-1)).as("hod"), col("n"), col("value_q"))
  }

  /** CUSUM changepoint detection (Page 1954) over hourly event counts:
    * per event type, the classic recursion S_t = max(0, S_{t−1} + n_t − k)
    * is rewritten as the closed window form
    * S_t = P_t − min(0, min_{j≤t} P_j), P_t = Σ_{j≤t}(n_j − k) —
    * running sum + running min sharing ONE (type, hour-ordered)
    * exchange, no sequential recursion, all integers (order-free and
    * parallelism-stable). Alarm fires at S_t ≥ h. Sparse-hour note:
    * hours with zero events are absent from the grid, so k is the drift
    * allowance per PRESENT hour (the gap-free form would gap-fill
    * first; documented contract).
    */
  def cusum(events: DataFrame, k: Long = 3, h: Long = 10): DataFrame = {
    require(h >= 1, s"cusum: alarm threshold h must be >= 1, got $h")
    val us = unix_micros(col("ts").cast("timestamp"))
    val hourly = events
      .withColumn("hour", floor(us / lit(3600000000.0)))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
    val ord = Window.partitionBy("event_type").orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("p", sum(col("n") - lit(k)).over(ord))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(ord)))
      .select(col("event_type"), col("hour"), col("n"), col("s"),
        (col("s") >= lit(h)).as("alarm"))
  }

  /** First-order Markov transition matrix over event types: consecutive
    * per-user event pairs in (time, event_id) order, counted per
    * (from_type, to_type) with the per-source transition probability in
    * exact ppm. The only shuffle on the raw stream is the per-user sort
    * window (lag is O(1) state); the count matrix is |types|² rows, so
    * the normalizing window is free.
    */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("from_type", lag("event_type", 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total_from", sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("CAST(n * 1000000 DIV total_from AS BIGINT)").as("prob_ppm"))
  }

  /** Gap-rule session INTERVALS: per-user sessions (same rule as
    * sessionize) with exact [t0, t1] epoch-microsecond bounds and the
    * per-user 1-based session ordinal. The lag + running-sum windows
    * shuffle once on user_id; everything downstream runs on sessions,
    * not events.
    */
  def sessionIntervals(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev", lag("us", 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid",
        sum("brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("t0"), max("us").as("t1"), count(lit(1)).as("n_events"))
  }

  /** Self interval-overlap join (co-presence): cross-user pairs of
    * sessions that overlap in time, with the exact overlap bounds — the
    * time-domain twin of geo_pair_join. The interval join becomes an
    * EQUI-join by exploding each session across the time buckets it
    * covers; a pair is emitted ONLY from the bucket containing the
    * overlap start (greatest(t0a, t0b) lies in exactly one bucket both
    * sides cover), so the join is duplicate-free WITHOUT a distinct —
    * the dedup predicate rides the join and the brute-force oracle
    * certifies losslessness end to end.
    *
    * Scale shape: explode factor = ceil(duration/bucketUs) per session
    * (bounded for gap-rule sessions); the join keys on the bucket so a
    * flash-crowd bucket is an AQE skew-join split, never a cartesian;
    * output is bounded by true overlaps, which the caller's bucketUs
    * does not affect.
    */
  def copresencePairs(events: DataFrame, gapMinutes: Int = 30,
                      bucketUs: Long = 3600L * 1000000L): DataFrame = {
    val iv = sessionIntervals(events, gapMinutes)
      .select(col("user_id"), col("sid"), col("t0"), col("t1"))
      .withColumn("bkt", explode(sequence(
        expr(s"t0 DIV ${bucketUs}L"), expr(s"t1 DIV ${bucketUs}L"))))
    val a = iv.select(col("bkt"), col("user_id").as("user_a"),
      col("sid").as("sid_a"), col("t0").as("t0a"), col("t1").as("t1a"))
    val b = iv.select(col("bkt"), col("user_id").as("user_b"),
      col("sid").as("sid_b"), col("t0").as("t0b"), col("t1").as("t1b"))
    a.join(b, Seq("bkt"))
      .filter(col("user_a") < col("user_b") &&
        col("t0a") <= col("t1b") && col("t0b") <= col("t1a") &&
        col("bkt") === expr(s"greatest(t0a, t0b) DIV ${bucketUs}L"))
      .select(col("user_a"), col("user_b"), col("sid_a"), col("sid_b"),
        greatest(col("t0a"), col("t0b")).as("ov_start_us"),
        (least(col("t1a"), col("t1b")) - greatest(col("t0a"), col("t0b")))
          .as("ov_us"))
  }

  /** Exponential time-decay activity score per user — the recency
    * weighting a training-mix / freshness sampler runs over an event log.
    * Weight of an event aged k whole hours (vs the corpus max timestamp)
    * is 2^(-min(k, 30)); the score is reported in integer "decay units"
    * of 2^-30: unit(e) = 2^(30 - min(k, 30)). EXACT by construction —
    * pure integer shifts summed as longs, so no FP, no rounding recipe,
    * no summation-order sensitivity (the usual exp(-λΔt) float fold is
    * order-dependent at the last ulp and NOT gate-safe). The 30-hour
    * floor changes scores by < 1e-9 relative — far below any ranking
    * use — and is what buys exactness.
    *
    * Scale shape: one scalar max (broadcast 1-row), then a map-side-
    * combined per-user sum. One shuffle.
    */
  def decayScores(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val maxT = events.agg(max(us).as("max_us"))
    events.select(col("user_id"), us.as("us"))
      .crossJoin(broadcast(maxT))
      .withColumn("k", expr("least((max_us - us) DIV 3600000000, 30)"))
      .groupBy("user_id")
      .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(30 - k AS INT)))")
        .as("decay_units"), count(lit(1)).as("n_events"))
  }

  /** Per-user trajectory summary — the movement-analytics primitive over
    * a positioned event stream (user_id, ts, seq, lon, lat): hops are
    * consecutive points in (ts, seq) order; each hop's great-circle
    * length is reported in WHOLE METERS as a BIGINT (the geo_haversine
    * trig recipe — at 10^7-m magnitudes a 1-m grid makes a JVM-vs-libm
    * ulp boundary flip a ~1e-8-per-row event), so the per-user totals
    * are exact integer sums, order-free.
    *
    * Scale shape: ONE exchange on user_id serves both the lag window and
    * the summary aggregate (Catalyst reuses the partitioning); nothing
    * wider than a user's own event list ever colocates.
    */
  def trajectorySummary(pts: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("seq"))
    val hops = pts
      .withColumn("plon", lag("lon", 1).over(w))
      .withColumn("plat", lag("lat", 1).over(w))
      .filter(col("plon").isNotNull)
      .withColumn("hop_m",
        round(SpatialStats.haversineCol(col("plon"), col("plat"),
          col("lon"), col("lat")), 0).cast("long"))
    hops.groupBy("user_id").agg(
      count(lit(1)).as("n_hops"),
      sum("hop_m").as("dist_m"),
      max("hop_m").as("max_hop_m"))
  }

  /** Per-type value stats with json-ish prop extraction (props is
    * '{"k": NN}'): exact integer parse both engines via substring.
    */
  def typeStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", expr("CAST(substr(props, 7, length(props) - 7) AS INT)"))
      .withColumn("cents", round(col("value") * lit(100.0)).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_sum"),
        sum("k").as("k_sum"), min("k").as("k_min"), max("k").as("k_max"))

  /** Exact inter-event-gap quantiles per event type via the
    * bounded-domain counting method ([[TextOps.lengthQuantiles]]'s
    * recipe on a different domain): per-user consecutive gaps in whole
    * seconds, then a (type, gap) histogram with cumulative-count
    * quantile reads — p_q = min gap with cum·100 ≥ n·q, exact, no
    * sketch. Shape: one user-keyed window exchange for the gaps, one
    * map-side-combined histogram aggregate; the quantile windows run on
    * the tiny histogram.
    */
  def gapQuantiles(events: DataFrame,
                   qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"gapQuantiles: percentiles must be in [1, 100], got $qs")
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_type"), col("event_id"), us.as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("event_type"), expr("(us - prev) div 1000000").as("gap_s"))
    val hist = gaps.groupBy("event_type", "gap_s").agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy("event_type").orderBy("gap_s")
    val wAll = Window.partitionBy("event_type")
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
    val qCols = qs.map(q =>
      min(when(col("cum") * 100 >= col("n") * q, col("gap_s"))).as(s"p$q"))
    val aggs = max(col("n")).as("n_gaps") +: min(col("gap_s")).as("min_gap") +:
      qCols :+ max(col("gap_s")).as("max_gap")
    cum.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
  }

  /** Marketing attribution per conversion: last-touch = the latest
    * `touchType` by the same user at or before the conversion (ever);
    * first-touch = the earliest touch inside the `lookbackUs` window.
    * Both are single RANGE/ROWS frames over ONE user-keyed exchange —
    * no self-join, no per-conversion scan: the window machinery carries
    * the candidate touch with the running max/min, which is the shape
    * that survives 10¹² events (a conversions×touches join would not).
    * Revenue is carried as exact integer cents.
    */
  def attribution(events: DataFrame, touchType: String = "click",
                  convType: String = "purchase",
                  lookbackUs: Long = 7L * 24 * 3600 * 1000000): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val e = events.select(col("event_id"), col("user_id"), col("event_type"),
      us.as("us"), round(col("value") * 100).cast("long").as("value_cents"))
      .where(col("event_type").isin(touchType, convType))
    val touchUs = when(col("event_type") === touchType, col("us"))
    // ties (touch and conversion at the same microsecond) count: the
    // frame upper bound is CURRENT ROW in RANGE terms, i.e. us <= conv_us
    val wLast = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wFirst = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-lookbackUs, Window.currentRow)
    e.withColumn("last_touch_us", max(touchUs).over(wLast))
      .withColumn("first_touch_us", min(touchUs).over(wFirst))
      .where(col("event_type") === convType)
      .select(col("event_id"), col("user_id"), col("us").as("conv_us"),
        col("value_cents"), col("last_touch_us"), col("first_touch_us"),
        col("last_touch_us").isNotNull.as("attributed"))
  }
}
