package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference has no streaming
  * (SURVEY.md §2.10); this is the forward-looking stream form of the
  * batch ops: the page/event tail is the source, watermark on event time,
  * windowed aggregates, and the same geocode→cell expressions running
  * per-record.
  */
object StreamOps {

  /** Streaming parquet source over a directory of event files. */
  def eventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts per event type with a watermark — late data
    * beyond the watermark is dropped (standard event-time semantics).
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * lit(100.0)).cast("long")).as("cents_sum"))

  /** Streaming exact dedup on the content digest — the incremental form
    * of Dedup.exact: first occurrence of each md5(text) within the
    * watermark horizon passes, later duplicates are dropped, and state
    * for digests older than the watermark is evicted (bounded state at
    * web-scale ingest; cross-horizon dups are the batch job's business).
    */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("ets", col(tsCol).cast("timestamp"))
      .withColumn("text_md5", md5(encode(col(textCol), "UTF-8")))
      .withWatermark("ets", watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  /** Streaming MinHash-LSH near-duplicate CANDIDATE pairs — the
    * incremental form of the banding stage of Dedup.minhashLshPairs
    * (probe-batch shape: each arriving doc pairs against the bucket's
    * current members, never all-pairs):
    *
    *  - the per-doc signature is a pure COLUMN expression (text arrives
    *    whole, so distinct-token min-hash needs no streaming aggregate:
    *    `array_min(transform(array_distinct(tokens), xxhash64(i, _)))`);
    *  - banded keys explode to (band, key) and each bucket is a
    *    `flatMapGroupsWithState` group: a new doc emits a pair with
    *    every member whose EVENT TIME is within the watermark delay of
    *    its own — an event-time pairing horizon, so the emitted pair set
    *    is DETERMINISTIC under replay (independent of micro-batch
    *    boundaries and of the one-batch watermark lag), the property
    *    that makes streaming ≡ batch assertable;
    *  - state is bounded by the watermark: members older than it are
    *    pruned each invocation and the group times out
    *    (EventTimeTimeout) once the watermark passes its newest member —
    *    cross-horizon dups are the batch job's business (same contract
    *    as dedupStream);
    *  - a pair discovered by several bands is emitted once per band
    *    (≤ `bands` copies, identical values): Spark's global-watermark
    *    correctness checker rejects chaining a second stateful dedup
    *    behind flatMapGroupsWithState, so collapsing duplicates belongs
    *    downstream — a set-semantic sink, a batch distinct, or a
    *    dropDuplicatesWithinWatermark in deployments that opt into
    *    multiple stateful operators.
    *
    * Emits (doc_a < doc_b, pair_ts). Exact-Jaccard verification joins
    * candidates back to token sets — batch territory
    * (Dedup.verifyJaccard); LSH only prunes, never decides.
    */
  def lshCandidateStream(docs: DataFrame, tsCol: String, idCol: String,
                         textCol: String, k: Int = 8, bands: Int = 4,
                         watermark: String = "2 hours"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    require(iv != null && iv.months == 0, s"unsupported watermark interval: $watermark")
    val horizonMs = iv.days * 86400000L + iv.microseconds / 1000L
    val dtoks = array_distinct(graft.ops.TextOps.tokens(col(textCol)))
    val sigCols = (1 to k).map(i =>
      array_min(transform(dtoks, t => xxhash64(lit(i), t))).as(s"s$i"))
    val withSig = docs
      .withColumn("ets", col(tsCol).cast("timestamp"))
      .withWatermark("ets", watermark)
      .select(Seq(col(idCol).cast("long").as("doc_id"), col("ets")) ++ sigCols: _*)
    val bandCols = (0 until bands).map { b =>
      val parts = (1 to rows).map(r => col(s"s${b * rows + r}"))
      struct(lit(b).as("band"), xxhash64(lit(b) +: parts: _*).cast("string").as("key"))
    }
    val banded = withSig
      .select(col("doc_id"), col("ets"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("ets"), col("bk.band").as("band"), col("bk.key").as("key"))
      .as[(Long, java.sql.Timestamp, Int, String)]
    val pairs = banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, java.sql.Timestamp)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[(Long, java.sql.Timestamp, Int, String)],
         state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var members = state.getOption.getOrElse(Nil).filter(_._2 >= wm)
            val out = collection.mutable.ArrayBuffer.empty[(Long, Long, java.sql.Timestamp)]
            rows.toArray.sortBy(r => (r._2.getTime, r._1)).foreach { r =>
              val id = r._1; val ts = r._2.getTime
              members.foreach { case (mid, mts) =>
                if (mid != id && math.abs(ts - mts) <= horizonMs)
                  out += ((math.min(mid, id), math.max(mid, id),
                    new java.sql.Timestamp(ts)))
              }
              members = (id, ts) :: members
            }
            if (members.isEmpty) state.remove()
            else {
              state.update(members)
              val horizon = members.map(_._2).max + 1
              state.setTimeoutTimestamp(math.max(horizon, wm + 1))
            }
            out.iterator
          }
      }
      .toDF("doc_a", "doc_b", "pair_ts")
    pairs
  }

  /** Streaming keep-latest per canonical URL — the incremental form of
    * WebOps.urlDedupLatest: a per-url argmax held in
    * flatMapGroupsWithState keyed by the normalized URL. The winner is
    * emitted when the event-time watermark passes the url's newest fetch
    * (group timeout), then state is dropped — state is bounded by the
    * watermark horizon exactly like dedupStream, and a recrawl arriving
    * after the horizon re-opens the group and re-emits (cross-horizon
    * collapse is the batch job's business). The winner ordering mirrors
    * the batch op's max-of-struct — (warc_sec, doc_id, url) descending —
    * so the emitted winner per url is deterministic under replay,
    * independent of micro-batch boundaries.
    *
    * Input columns: (doc_id, url, warc_sec epoch-seconds). Emits
    * (norm_url, doc_id, url, warc_sec).
    */
  def urlLatestStream(pages: DataFrame, watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = pages.sparkSession
    import spark.implicits._
    val rows = pages
      .withColumn("ets", col("warc_sec").cast("timestamp"))
      .withWatermark("ets", watermark)
      .select(graft.ops.WebOps.normalizeUrl(col("url")).as("norm_url"),
        col("doc_id").cast("long").as("doc_id"), col("url"),
        col("warc_sec").cast("long").as("warc_sec"), col("ets"))
      .as[(String, Long, String, Long, java.sql.Timestamp)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (String, Long, String, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[(String, Long, String, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, String)]) =>
          if (state.hasTimedOut) {
            val (sec, id, u) = state.get
            state.remove()
            Iterator((key, id, u, sec))
          } else {
            val ord = Ordering[(Long, Long, String)]
            var best = state.getOption.orNull
            var newest = Long.MinValue
            it.foreach { r =>
              val cand = (r._4, r._2, r._3)
              if (best == null || ord.compare(cand, best) > 0) best = cand
              newest = math.max(newest, r._5.getTime)
            }
            state.update(best)
            state.setTimeoutTimestamp(
              math.max(newest + 1, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }.toDF("norm_url", "doc_id", "url", "warc_sec")
  }

  /** Stateful streaming sessionization — custom per-key state via
    * flatMapGroupsWithState (the north-rule "custom state" surface):
    * events grouped by user; a session closes when `gapSec` passes
    * without activity (event-time timeout). Emits
    * (user_id, session_start_ms, n_events) per closed session.
    * Batch equivalent: ops/Events.sessionize (lag-window form).
    */
  def sessionizeStream(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000L // milliseconds internally

    // the watermarked column itself must survive into the grouped Dataset
    val typed = events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", s"${gapSec * 2} seconds")
      .select(col("user_id").cast("long").as("user_id"), col("ets"))
      .as[(Long, java.sql.Timestamp)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap → close the open session
            val out = state.getOption.map { case (s, _, n) => (user, s, n) }
            state.remove()
            out.iterator
          } else {
            // fold the micro-batch's events (one open session per user)
            val sorted = rows.map(_._2.getTime).toArray.sorted
            var open = state.getOption
            val closed = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            sorted.foreach { us =>
              open match {
                case Some((s, last, n)) if us - last <= gapUs =>
                  open = Some((s, us, n + 1))
                case Some((s, _, n)) =>
                  closed += ((user, s, n))
                  open = Some((us, us, 1L))
                case None =>
                  open = Some((us, us, 1L))
              }
            }
            open.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gapSec * 2000)
            }
            closed.iterator
          }
      }
      .toDF("user_id", "session_start_ms", "n_events")
  }

  /** Streaming HyperLogLog registers: the incremental form of
    * [[graft.ops.Sketches.hllRegisters]] — live approximate distinct
    * counts (URLs per language, hosts per cell) over an unbounded crawl
    * stream. The batch op IS streaming-legal as written: one stateful
    * max-aggregation whose state is bounded by groups × 2^p registers
    * (kilobytes per group FOREVER, regardless of how many keys stream
    * through — that is the sketch's whole point), emitted in complete
    * mode. Register max is order-insensitive, so the streaming result
    * after any prefix equals the batch sketch of that prefix exactly
    * (StreamingSpec pins streaming ≡ batch).
    */
  def hllRegisterStream(rows: DataFrame, keyCol: String,
                        groupCols: Seq[String], p: Int = 9,
                        family: String = "xxhash64"): DataFrame =
    graft.ops.Sketches.hllRegisters(rows, keyCol, groupCols, p, family)

  /** Streaming KMV registers: live bottom-k distinct sketching over an
    * unbounded key stream. Unlike HLL/CMS the batch op ranks with a
    * window (not streaming-legal), so the streaming form keeps the
    * bottom-k as EXPLICIT bounded state — at most k longs per group,
    * FOREVER — folding each trigger's hashes in with a capped ordered
    * set and re-emitting the group's full register set (Update-mode
    * downstream keeps the newest emission). Bottom-k of a set is
    * order-free, so any prefix's streaming registers equal the batch
    * [[graft.ops.Sketches.kmvRegisters]] of that prefix exactly.
    */
  def kmvRegisterStream(rows: DataFrame, keyCol: String, groupCol: String,
                        k: Int = 64, family: String = "xxhash64"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 2 && k <= 65536, s"kmv: k must be in [2, 65536], got $k")
    val spark = rows.sparkSession
    import spark.implicits._
    val hashed = rows.select(col(groupCol).cast("string").as("grp"),
      graft.ops.Sketches.hash60(col(keyCol), family).as("hv"))
      .as[(String, Long)]
    hashed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (String, Int, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val buf = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(_.foreach(buf += _))
          it.foreach { r =>
            val h = r._2
            if (buf.size < k) buf += h
            else if (h < buf.last) { buf += h; if (buf.size > k) buf -= buf.last }
          }
          val regs = buf.toArray
          state.update(regs)
          regs.iterator.zipWithIndex.map { case (h, i) => (key, i + 1, h) }
      }.toDF(groupCol, "slot", "hv")
  }

  /** Streaming Count-Min registers: live frequency sketching over an
    * unbounded key stream (hot tokens, hot hosts) — like
    * [[hllRegisterStream]], the batch op is streaming-legal as written
    * (one stateful SUM aggregation, state bounded by groups × depth ×
    * width forever) and counter sums are order-free, so any prefix's
    * streaming registers equal the batch sketch of that prefix exactly.
    */
  def cmsRegisterStream(rows: DataFrame, keyCol: String,
                        groupCols: Seq[String], width: Int = 256,
                        depth: Int = 4,
                        family: String = "xxhash64"): DataFrame =
    graft.ops.Sketches.cmsRegisters(rows, keyCol, groupCols, width, depth, family)

  /** Streaming geofence: pages geocoded and point-in-polygon matched
    * against a broadcast polygon set AS THEY ARRIVE — the live alerting
    * form of the batch PIP join. Stateless (geocode + broadcast R-tree
    * probe are per-row codegen'd expressions), so the batch operator is
    * streaming-legal unchanged, Append-mode clean, and any prefix's
    * alert stream equals the batch join of that prefix exactly.
    */
  def geofenceStream(pages: DataFrame,
                     polys: Seq[(Long, graft.geo.Polygon)]): DataFrame = {
    graft.expr.GraftFunctions.register(pages.sparkSession)
    import graft.expr.GraftFunctions._
    val pts = pages
      .withColumn("geo", geocodeUrl(col("url")))
      .withColumn("lon", col("geo.lon"))
      .withColumn("lat", col("geo.lat"))
    graft.joins.SpatialJoins.pipJoinBroadcast(pts, polys, "lon", "lat")
      .select(col("url"), col("lon"), col("lat"), col("poly_id"))
  }

  /** Stream-stream interval join: pairs of events of the same type from
    * distinct users within ±`deltaSec` of each other — the live form of
    * Events.copresencePairs' interval overlap. A true two-sided
    * stream-stream inner join: BOTH sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can size the join
    * state to watermark + delta and evict symmetric state as the
    * watermark advances (bounded state at web-scale ingest; this is the
    * only join shape Structured Streaming admits between two unbounded
    * streams, and exactly why the op is expressed this way).
    * `user_a < user_b` canonicalizes pairs so each fires once.
    */
  def copresenceStream(left: DataFrame, right: DataFrame,
                       deltaSec: Long = 300,
                       watermark: String = "2 hours"): DataFrame = {
    val a = left.select(col("user_id").as("user_a"),
        col("event_id").as("ev_a"), col("event_type").as("etype"),
        col("ts").cast("timestamp").as("ts_a"))
      .withWatermark("ts_a", watermark)
    val b = right.select(col("user_id").as("user_b"),
        col("event_id").as("ev_b"), col("event_type").as("etype_b"),
        col("ts").cast("timestamp").as("ts_b"))
      .withWatermark("ts_b", watermark)
    a.join(b, col("etype") === col("etype_b") &&
        col("user_a") < col("user_b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $deltaSec SECONDS") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $deltaSec SECONDS"))
      .select(col("user_a"), col("user_b"), col("ev_a"), col("ev_b"),
        col("etype"), col("ts_a"), col("ts_b"))
  }

  /** Streaming CUSUM: the live form of [[graft.ops.Events.cusum]] —
    * per-type hourly counts accumulate as bounded open-hour state inside
    * ONE flatMapGroupsWithState; when the watermark passes an hour's
    * end, the hour closes IN ORDER and the exact integer recursion
    * S = max(0, S + n − k) advances (carried as (P, minP), the same
    * closed form the batch op windows). Alarms emit append-only at hour
    * close. Rows for already-closed hours are dropped — the late-data
    * contract a watermarked window agg would apply. State per key =
    * open hours within the watermark horizon + three Longs, bounded
    * forever.
    */
  def cusumStream(events: DataFrame, k: Long = 1, h: Long = 5,
                  watermark: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", watermark)
      .select(col("event_type").cast("string").as("event_type"), col("ets"))
      .as[(String, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(List[(Long, Long)], Long, Long, Long),
                              (String, Long, Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (ty: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[(List[(Long, Long)], Long, Long, Long)]) =>
          var (open, p, pmin, lastClosed) = state.getOption
            .getOrElse((List.empty[(Long, Long)], 0L, Long.MaxValue, Long.MinValue))
          var m = open.toMap
          rows.foreach { case (_, ts) =>
            val hr = Math.floorDiv(ts.getTime, 3600000L)
            if (hr > lastClosed) // late-beyond-watermark rows drop
              m = m.updated(hr, m.getOrElse(hr, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val (closing, staying) = m.partition { case (hr, _) =>
            (hr + 1) * 3600000L <= wm
          }
          val out = closing.toSeq.sortBy(_._1).map { case (hr, n) =>
            p += n - k
            if (p < pmin) pmin = p
            lastClosed = hr
            val s = p - math.min(0L, pmin)
            (ty, hr, n, s, s >= h)
          }
          state.update((staying.toList, p, pmin, lastClosed))
          // timeout only while an open hour is waiting on the watermark;
          // with nothing open, new data re-triggers the group anyway —
          // re-arming here would wake every key every hour forever
          if (staying.nonEmpty)
            state.setTimeoutTimestamp((staying.keys.min + 1) * 3600000L)
          out.iterator
      }
      .toDF("event_type", "hour", "n", "s", "alarm")
  }

  /** Streaming SCD2: the live form of [[graft.ops.Events.scd2]] — keyed
    * change-interval tracking where an interval CLOSES (and emits,
    * append-only) exactly when the next change is finalized by the
    * watermark. Observations buffer until the watermark passes them,
    * then fold in (ts, ord) order: consecutive duplicates collapse, a
    * value change closes the open interval with its effective_to and
    * version. The still-current interval never emits (it would change —
    * the sessionizeStream contract). Late-beyond-finalized rows drop.
    * State per key = the open interval + in-horizon buffer, bounded.
    */
  def scd2Stream(log: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = log.sparkSession
    import spark.implicits._
    val typed = log
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ets"),
        col("event_type").cast("string").as("v"),
        col("event_id").cast("long").as("ord"))
      .as[(Long, java.sql.Timestamp, String, Long)]
    // state: (pending (tsMs, ord, v), open (v, fromMs), version, lastFin)
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[
        (List[(Long, Long, String)], Option[(String, Long)], Long, Long),
        (Long, String, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (u: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Long)],
         state: GroupState[(List[(Long, Long, String)], Option[(String, Long)], Long, Long)]) =>
          var (pending, open, ver, lastFin) = state.getOption
            .getOrElse((List.empty[(Long, Long, String)],
              Option.empty[(String, Long)], 0L, Long.MinValue))
          rows.foreach { case (_, ts, v, ord) =>
            if (ts.getTime > lastFin) pending = (ts.getTime, ord, v) :: pending
          }
          val wm = state.getCurrentWatermarkMs()
          val (ready, hold) = pending.partition(_._1 <= wm)
          val out = collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
          ready.sortBy(r => (r._1, r._2)).foreach { case (tsMs, _, v) =>
            open match {
              case Some((ov, _)) if ov == v => () // consecutive duplicate
              case Some((ov, from)) =>
                out += ((u, ov, from, tsMs, ver))
                open = Some((v, tsMs)); ver += 1
              case None =>
                open = Some((v, tsMs)); ver = 1L
            }
            lastFin = math.max(lastFin, tsMs)
          }
          state.update((hold, open, ver, lastFin))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(wm + 1, hold.map(_._1).min))
          out.iterator
      }
      .toDF("user_id", "event_type", "effective_from_ms", "effective_to_ms",
        "version")
  }

  /** Streaming marketing attribution — the incremental twin of
    * [[graft.ops.Events.attribution]]: per user, conversions finalize
    * when the watermark passes their event time (every touch at or
    * before them must then have arrived), taking last-touch = the max
    * touch time ≤ conv time (EVER — touches older than the lookback
    * horizon fold into one scalar per user before eviction, so state
    * stays bounded at lookback-window depth without weakening the
    * semantics) and first-touch = the min touch time inside
    * [conv − lookback, conv]. Same-microsecond touches count for both,
    * matching the batch RANGE frames. Late-beyond-finalized rows drop
    * (the cusumStream contract). Append-mode clean.
    *
    * Watermark note: the type filter is pushed below the watermark
    * operator by Catalyst, so only touch/conversion rows advance event
    * time — a stream of solely other event types holds conversions
    * open (they finalize on the next touch/conv arrival).
    */
  def attributionStream(events: DataFrame, touchType: String = "click",
                        convType: String = "purchase",
                        lookbackUs: Long = 7L * 24 * 3600 * 1000000,
                        watermark: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", watermark)
      .where(col("event_type").isin(touchType, convType))
      .select(col("user_id").cast("long").as("user_id"), col("ets"),
        col("event_type").cast("string").as("tpe"),
        col("event_id").cast("long").as("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, String, Long, Long)]
    // state: (buffered (us, event_id, cents, isTouch), maxTouchEvictedUs,
    //         lastFinalizedUs)
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[
        (List[(Long, Long, Long, Boolean)], Long, Long),
        (Long, Long, Long, Long, Option[Long], Option[Long], Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (u: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Long, Long)],
         state: GroupState[(List[(Long, Long, Long, Boolean)], Long, Long)]) =>
          var (buf, maxEvicted, lastFin) = state.getOption
            .getOrElse((List.empty[(Long, Long, Long, Boolean)],
              Long.MinValue, Long.MinValue))
          rows.foreach { case (_, ts, tpe, id, cents) =>
            // exact microseconds (getTime truncates to ms; the batch twin
            // compares unix_micros, so sub-ms ties/lookback boundaries
            // must resolve identically)
            val us = ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000
            if (us > lastFin) buf = (us, id, cents, tpe == touchType) :: buf
          }
          val wm = state.getCurrentWatermarkMs() * 1000L
          val out = collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, Option[Long], Option[Long], Boolean)]
          buf.filter { case (us, _, _, isT) => !isT && us <= wm }
            .sortBy(c => (c._1, c._2))
            .foreach { case (cus, cid, cents, _) =>
              val touches = buf.collect { case (us, _, _, true) if us <= cus => us }
              val last = (maxEvicted +: touches).max match {
                case Long.MinValue => None
                case v => Some(v)
              }
              val first = touches.filter(_ >= cus - lookbackUs) match {
                case Nil => None
                case ts => Some(ts.min)
              }
              out += ((cid, u, cus, cents, last, first, last.isDefined))
              lastFin = math.max(lastFin, cus)
            }
          // evict: finalized conversions; touches past the lookback
          // horizon fold into the scalar
          val horizon = wm - lookbackUs
          val (old, keep) = buf.partition {
            case (us, _, _, isT) => (isT && us < horizon) || (!isT && us <= wm)
          }
          old.foreach { case (us, _, _, isT) =>
            if (isT) maxEvicted = math.max(maxEvicted, us)
          }
          buf = keep
          state.update((buf, maxEvicted, lastFin))
          if (buf.exists(!_._4))
            state.setTimeoutTimestamp(
              math.max(wm / 1000L + 1, buf.filter(!_._4).map(_._1 / 1000L).min))
          out.iterator
      }
      .toDF("event_id", "user_id", "conv_us", "value_cents",
        "last_touch_us", "first_touch_us", "attributed")
  }

  /** Streaming tiling: geocode each page record and count per hex cell —
    * the incremental form of Pipeline.tilePages. Works on any stream with
    * a `url` column.
    */
  def streamingTileCounts(pages: DataFrame, res: Int): DataFrame = {
    graft.expr.GraftFunctions.register(pages.sparkSession)
    import graft.expr.GraftFunctions._
    pages
      .withColumn("geo", geocodeUrl(col("url")))
      .withColumn("h3", h3Cell(col("geo.lon"), col("geo.lat"), lit(res)))
      .groupBy("h3")
      .agg(count(lit(1)).as("n_pages"))
  }
}
