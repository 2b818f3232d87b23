package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale-first plan guards: these assertions pin the physical-plan
  * properties that matter at 100 TB — column pruning reaching the
  * parquet scan (a scan that reads `text` for a count is a 1000×
  * regression at web scale), predicate pushdown reaching the source,
  * and partial (map-side) aggregation below every shuffle. They fail
  * loudly if a future refactor breaks what `.explain` reviews caught
  * manually in earlier rounds.
  */
class ScanPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("language-ID scan prunes documents to (doc_id, text, lang)") {
    val p = physical("text_langid")
    assert(p.contains("ReadSchema"), p.take(400))
    // the untouched columns must not reach the scan
    assert(!p.contains("source") && !p.contains("n_chars"),
      "scan reads columns the query never uses:\n" + p.take(1200))
  }

  test("tpch_q3 pushes the status/date filters into the parquet scans") {
    val p = physical("tpch_q3")
    assert(p.contains("PushedFilters: ["), p.take(400))
    // at least one non-empty pushdown (status or date bound) — drop the
    // plan prefix before "PushedFilters: [", it would match vacuously
    assert(p.split("PushedFilters: \\[").drop(1).exists(s => !s.startsWith("]")),
      "no filter reached a scan:\n" + p.take(1500))
  }

  test("salted exact count-distinct keeps map-side partial aggregation") {
    val p = physical("geo_cell_distinct_salted")
    // two-phase salted agg: partial aggregation must appear below the
    // shuffle (HashAggregate partial_*), and the final sum per cell above
    assert(p.contains("partial_"), "no map-side combine:\n" + p.take(1500))
    assert(p.contains("Exchange hashpartitioning"), p.take(400))
  }

  test("tfidf does not force-broadcast the vocabulary df table (VERDICT r4 #3)") {
    // The vocabulary is unbounded at web scale — the join strategy must
    // be AQE's call, not a plan-time hint. The only ResolvedHint allowed
    // in the logical plan is the 1-row n_docs scalar.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = graft.SparkEntry.queries("text_tfidf")(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.size == 1,
      s"expected exactly the n_docs broadcast hint, found ${hints.size}:\n" +
        hints.mkString("\n").take(1500))
    // the one permitted hint must be the scalar n_docs aggregate, not the
    // per-token df table
    assert(hints.head.child.output.map(_.name) == Seq("n_docs"),
      "the forced broadcast is not the n_docs scalar:\n" + hints.head.toString.take(1500))
  }

  test("bm25 does not force-broadcast the vocabulary df table (tfidf lesson)") {
    // same hazard as tfidf: the only permitted plan-time hint is the
    // 1-row (n_docs, avgdl) stats scalar, never the per-token df side
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = graft.SparkEntry.queries("text_bm25")(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.size == 1,
      s"expected exactly the stats-scalar broadcast hint, found ${hints.size}:\n" +
        hints.mkString("\n").take(1500))
    assert(hints.head.child.output.map(_.name) == Seq("n_docs", "avgdl"),
      "the forced broadcast is not the stats scalar:\n" + hints.head.toString.take(1500))
  }

  test("hamming near-dup join is a bucket equi-join, never a nested-loop/cartesian") {
    // The pigeonhole banding must reach the physical plan as an equi-join
    // on (band, word) with the capped index side built by a window rank —
    // a refactor that degrades the condition to a theta-join would turn a
    // hot-word bucket into a cartesian at web scale.
    import spark.implicits._
    val hashes = (0L until 64L).map(i => (i, i * 0x9e3779b97f4a7c15L))
      .toDF("doc_id", "phash")
    val p = graft.ops.ImageHash.hammingPairs(hashes, "doc_id", maxDist = 3,
      capPerBucket = 8).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "hamming join degraded to a non-equi join:\n" + p.take(1500))
    assert(p.contains("WindowGroupLimit") || p.contains("RunningWindowFunction")
      || p.contains("Window"), "bucket cap (row_number window) missing:\n" + p.take(1500))
    val cp = graft.ops.ImageHash.phashClusters(hashes, "doc_id", maxDist = 3,
      capPerBucket = 8).queryExecution.executedPlan.toString
    assert(!cp.contains("CartesianProduct") && !cp.contains("BroadcastNestedLoopJoin"),
      "phashClusters degraded to a non-equi join:\n" + cp.take(1500))
    // the text form (simhashPairs) rides the same machinery: exactly one
    // fingerprint HashAggregate pair feeding the band join, no theta-join
    val docs = (0L until 8L).map(i => (i, s"tok$i alpha beta"))
      .toDF("doc_id", "text")
    val sp = graft.ops.Dedup.simhashPairs(docs, capPerBucket = 8)
      .queryExecution.executedPlan.toString
    assert(!sp.contains("CartesianProduct") && !sp.contains("BroadcastNestedLoopJoin"),
      "simhashPairs degraded to a non-equi join:\n" + sp.take(1500))
  }

  test("link extraction is map-only (zero shuffles) and prunes to (doc_id, html)") {
    // extractLinks is one codegen'd regexp_extract_all + posexplode per
    // page; at crawl scale this is the pass producing the 10^11-edge
    // link graph, so a refactor that sneaks in an Exchange (or drags
    // unused page columns through the scan) is a full-corpus regression.
    import org.apache.spark.sql.functions._
    val pages = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), concat(lit("<a href=\"h"),
        col("doc_id").cast("string"), lit("\">x</a>")).as("html"))
    val p = graft.ops.WebOps.extractLinks(pages, "html")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "extractLinks gained a shuffle:\n" + p.take(1500))
    assert(!p.contains("text") && !p.contains("n_chars"),
      "scan reads columns link extraction never uses:\n" + p.take(1200))
  }

  test("winnow fingerprint selection is map-only (zero shuffles)") {
    // The whole selection — grams, hashes, window minima, within-doc
    // distinct — is per-row column expressions; a refactor that
    // introduces an Exchange (e.g. a per-doc groupBy for the distinct)
    // would add a full-corpus shuffle to what should be a free map stage.
    val p = physical("text_winnow")
    assert(!p.contains("Exchange"),
      "winnow gained a shuffle:\n" + p.take(1500))
  }

  test("cell-set uncompact expands map-only above the distinct's one shuffle") {
    // CellSets.uncompact claims to be a pure generator (Morton-suffix
    // explode) — the only Exchange in geo_cell_uncompact must be the
    // input distinct, with the 4^d fan-out running map-side after it.
    val p = physical("geo_cell_uncompact")
    assert(p.contains("Generate explode"),
      "uncompact lost its generator form:\n" + p.take(1500))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "uncompact should shuffle exactly once (the distinct):\n" + p.take(1500))
  }

  test("cover-prefilter PIP broadcasts both small sides and shuffles once") {
    // geo_cover_pip's scale shape: ancestor-chain generator (map-only),
    // the adaptive covers and the rect verify table both BROADCAST, and
    // the only Exchange is the final per-polygon aggregate. A refactor
    // that degrades either join to shuffle/cartesian re-keys the whole
    // page corpus.
    val p = physical("geo_cover_pip")
    assert(p.contains("Generate"), "ancestor-chain generator missing:\n" + p.take(1200))
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2,
      "cover/verify join not broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "prefilter join degraded:\n" + p.take(1500))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "should shuffle exactly once (the final agg):\n" + p.take(1500))
  }

  test("exact dedup aggregates map-side before its single shuffle") {
    val p = physical("dedup_exact")
    assert(p.contains("partial_count") || p.contains("partial_"),
      "exact dedup lost its map-side combine:\n" + p.take(1500))
    // exactly one shuffle: the groupBy on the digest
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "dedup_exact should shuffle exactly once:\n" + p.take(1500))
  }

  test("robots decision is map-only on the page side behind one broadcast join") {
    // all shuffles must belong to the (tiny) rules side: the PAGE-side
    // subtree above the BroadcastHashJoin's streamed input may contain
    // no Exchange — a refactor that re-keys the corpus by host would
    // shuffle 10^12 rows for a kilobyte-per-host decision
    val df = graft.SparkEntry.queries("web_robots")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    val streamedSide = p.substring(p.indexOf("BroadcastHashJoin"))
      .split("BroadcastExchange")(0) // text between the join and its build side
    assert(!streamedSide.contains("Exchange hashpartitioning"),
      "page side of web_robots shuffles:\n" + p.take(2000))
  }

  test("mojibake repair and DP simplify run with zero exchanges") {
    for (name <- Seq("text_fix_encoding", "vector_simplify")) {
      val p = physical(name)
      assert(!p.contains("Exchange"),
        s"$name should be map-only:\n" + p.take(1500))
    }
  }

  test("cosine AllPairs does not force-broadcast the df table (same hazard as tfidf)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = graft.SparkEntry.queries("dedup_cosine_pairs")(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty,
      s"no join in cosineSimilarPairs may be hint-forced, found ${hints.size}")
  }

  test("collocations/lm_score force-broadcast ONLY their 1-row total scalar") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (q <- Seq("text_collocations", "text_lm_score")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      assert(hints.size == 1, s"$q: expected only the total-scalar hint, " +
        s"found ${hints.size}")
      assert(hints.head.child.output.map(_.name) == Seq("n"),
        s"$q: the forced broadcast is not the corpus-total scalar:\n" +
          hints.head.toString.take(800))
    }
  }

  test("HLL register derivation is map-only below its single shuffle") {
    val p = physical("url_hll_regs")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      "registers must cost exactly one shuffle:\n" + p.take(1500))
    assert(p.contains("partial_"), "no map-side combine:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(400))
  }

  test("CMS registers: one scan (posexplode'd depth rows), one shuffle") {
    val p = physical("text_cms")
    assert(p.contains("Generate"), "depth rows must ride a generator, " +
      "not depth re-scans:\n" + p.take(1200))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      "registers must cost exactly one shuffle:\n" + p.take(1500))
    assert(p.split("FileScan").length - 1 == 1,
      "CMS must not re-scan the corpus per depth row:\n" + p.take(1500))
  }

  test("html_meta is a pure projection: zero exchanges") {
    val p = physical("html_meta")
    assert(!p.contains("Exchange"), "head extraction must stay map-only:\n" +
      p.take(1200))
  }

  test("systematic sampling keeps the global window off the raw rows") {
    // two tiny global exchanges are legitimate (the per-bucket offsets
    // window and the 1-row total scalar); the raw rows themselves must
    // ride a bucket-PARTITIONED window, never a global sort
    val p = physical("select_systematic")
    assert(p.split("Exchange SinglePartition").length - 1 <= 2,
      "unexpected extra global exchange:\n" + p.take(2000))
    assert(p.contains("windowspecdefinition(bkt"),
      "the local cumsum window lost its bucket partitioning:\n" + p.take(2000))
  }

  test("boilerplate strip never goes non-equi") {
    val p = physical("web_boilerplate")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(1200))
    assert(p.contains("partial_"), "frequency aggs lost map-side combine:\n" +
      p.take(1500))
  }

  test("range join rides one broadcast cell equi-join, never a theta join") {
    // geo_range_join's 100-TB shape: the target side is map-only into a
    // BroadcastHashJoin on the cell id; a refactor that degrades to
    // BroadcastNestedLoopJoin (the default for non-equi conditions)
    // re-introduces the O(N×P) scan the cover prefilter exists to kill.
    val p = physical("geo_range_join")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "range join went non-equi:\n" + p.take(1500))
  }

  test("KMV rank filter rewrites to WindowGroupLimit below the exchange") {
    // url_kmv must pre-trim every partition to its local bottom-k before
    // the shuffle — without WindowGroupLimit a 10^12-key group sorts its
    // full distinct hash set on one reducer.
    val p = physical("url_kmv")
    assert(p.contains("WindowGroupLimit"),
      "bottom-k lost the partial group-limit rewrite:\n" + p.take(1500))
  }

  test("tile pyramid: one generator, one shuffle for all five levels") {
    val p = physical("geo_pyramid")
    assert(p.contains("Generate explode"),
      "pyramid lost its ancestor-chain generator:\n" + p.take(1500))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "pyramid should shuffle exactly once:\n" + p.take(1500))
    assert(p.contains("partial_"), "pyramid agg lost map-side combine:\n" +
      p.take(1500))
  }

  test("hilbert and geohash encoders are map-only projections") {
    for (name <- Seq("geo_hilbert", "geo_geohash")) {
      val p = physical(name)
      assert(!p.contains("Exchange"), s"$name gained a shuffle:\n" + p.take(1500))
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
        s"$name fell out of codegen:\n" + p.take(1200))
    }
  }

  test("tpch_q6 pushes all three predicates into the parquet scan") {
    val p = physical("tpch_q6")
    assert(p.split("PushedFilters: \\[").drop(1).exists(s => !s.startsWith("]")),
      "no filter reached the lineitem scan:\n" + p.take(1500))
    // scan must not read the columns Q6 never touches
    assert(!p.contains("l_returnflag") && !p.contains("l_partkey"),
      "scan reads columns Q6 never uses:\n" + p.take(1500))
  }

  test("copresence interval join stays an equi-join on the time bucket") {
    // the overlap predicate must RIDE the bucket equi-join; a refactor
    // that lifts it into the join keys' absence degrades to a
    // nested-loop over all session pairs — the exact O(N²) the
    // bucket-explode exists to kill
    val p = physical("events_copresence")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "interval join went non-equi:\n" + p.take(1500))
    assert(p.contains("Generate explode"),
      "lost the bucket-explode generator:\n" + p.take(1500))
  }

  test("skyline prefix-max never windows or sorts the raw part rows") {
    // the global ordered window is allowed ONLY over the per-bucket
    // frame (row count = priceRange/bucket, independent of N); the raw
    // rows contribute through a map-side-combined price-group agg and a
    // bucket-PARTITIONED window
    val p = physical("part_skyline")
    assert(p.contains("partial_"), "price-group agg lost map-side combine:\n" +
      p.take(1500))
    assert(p.contains("windowspecdefinition(bkt"),
      "in-bucket prefix max lost its bucket partitioning:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "skyline grew a dominance theta-join:\n" + p.take(1500))
  }

  test("q13 zero-preserving join stays equi with map-side order counts") {
    val p = physical("tpch_q13")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(1200))
    assert(p.contains("partial_"), "order counts lost map-side combine:\n" +
      p.take(1500))
  }

  test("q19 broadcasts the part dim and pushes scan filters (never SMJ)") {
    val p = physical("tpch_q19")
    assert(p.contains("BroadcastHashJoin"),
      "q19's dim join is not broadcast:\n" + p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    assert(p.contains("PushedFilters: ["), p.take(400))
  }

  test("q12 stays one broadcast join + conditional map-side combine") {
    val p = physical("tpch_q12")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("partial_"),
      "q12 split counts lost map-side combine:\n" + p.take(1500))
  }

  test("densify/interpolate cost exactly ONE exchange (the fid window)") {
    for (n <- Seq("vector_densify", "vector_line_interp")) {
      val p = physical(n)
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges === 1, s"$n grew to $exchanges exchanges:\n" + p.take(1500))
      assert(!p.contains("CartesianProduct") && !p.contains("Join"), p.take(1200))
    }
  }

  test("readability is map-only: zero exchanges, pruned scan") {
    val p = physical("text_readability")
    assert(!p.contains("Exchange"),
      "readability must not shuffle:\n" + p.take(1500))
    assert(!p.contains("source"), // untouched documents columns pruned
      "scan reads columns the query never uses:\n" + p.take(1200))
  }

  test("hotspot stencil is a generator + one combine-friendly aggregation") {
    val p = physical("geo_hotspots")
    assert(p.contains("Generate explode"),
      "hotspots lost the stencil generator:\n" + p.take(1500))
    assert(p.contains("partial_"), "stencil agg lost map-side combine:\n" +
      p.take(1500))
    // the only non-equi join allowed is the broadcast 1-row stats frame
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("area-weighted zonal: pixels never shuffle, one combined agg") {
    // zones broadcast; each tile emits per-(zone,band) PARTIALS, so the
    // only Exchange is the final aggregate and it must combine map-side.
    // A refactor emitting per-PIXEL rows re-keys the whole raster.
    val p = physical("raster_zonal_weighted")
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "weighted zonal should shuffle exactly once:\n" + p.take(1500))
    assert(p.contains("partial_"),
      "weighted zonal lost its map-side combine:\n" + p.take(1500))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("vector tiling cut is map-only fan-out: zero exchanges, no join") {
    val p = physical("vector_tile_clip")
    assert(!p.contains("Exchange"),
      "clipToGrid gained a shuffle:\n" + p.take(1500))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("trajectory summary: the user_id exchange is shared by window and agg") {
    // lag window partitioned by user_id + groupBy user_id must reuse ONE
    // Exchange; a second would mean the summary re-shuffles the hops
    val p = physical("events_trajectory")
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "trajectory grew a second shuffle:\n" + p.take(1500))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("random projection is map-only: zero exchanges, pruned scan") {
    val p = physical("emb_rp")
    assert(!p.contains("Exchange"),
      "emb_rp gained a shuffle:\n" + p.take(1500))
    assert(!p.contains("label"), // untouched embeddings column pruned
      "scan reads columns the query never uses:\n" + p.take(1200))
  }

  test("decay scores: one broadcast scalar + one combined agg") {
    // the corpus-max timestamp is a 1-row broadcast; the page side keeps
    // its single shuffle (the per-user agg) with map-side combine
    val p = physical("events_decay")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "max-ts frame not broadcast:\n" + p.take(1500))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "decay scores should shuffle exactly once:\n" + p.take(1500))
    assert(p.contains("partial_"),
      "decay agg lost its map-side combine:\n" + p.take(1500))
  }

  test("q21 decorrelates EXISTS/NOT-EXISTS to semi + anti joins, no CP") {
    val p = physical("tpch_q21")
    assert(p.contains("LeftSemi"), "missing semi join:\n" + p.take(1500))
    assert(p.contains("LeftAnti"), "missing anti join:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q17 correlated AVG becomes one partial agg joined back, no window") {
    val p = physical("tpch_q17")
    assert(p.contains("partial_"), "per-part agg lost map-side combine:\n" + p.take(1500))
    assert(!p.contains("Window"), "q17 must not window the raw lineitem:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("stump: rows feed exactly one binned histogram aggregation") {
    // the only row-touching pass is the (feature, bin) class-count agg
    // (partial below its exchange); dominance runs on the tiny candidate
    // frame via broadcast, never a sort-merge join
    val p = physical("ml_stump")
    assert(p.contains("partial_"), "histogram agg lost map-side combine:\n" + p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      "dominance must stay broadcast on the candidate frame:\n" + p.take(1500))
  }

  test("quality containment stays a semi join, never a nested loop on rows") {
    val p = physical("quality_checks")
    assert(p.contains("LeftSemi"), "containment lost its semi join:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("cusum: both windows share ONE (event_type) exchange") {
    val p = physical("events_cusum")
    // hourly agg shuffles on (type, hour), windows re-key on type: 2 total
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") <= 2,
      "cusum grew extra shuffles:\n" + p.take(1500))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("reservoir sample plans as WindowGroupLimit (partial bottom-k)") {
    val p = physical("select_reservoir")
    assert(p.contains("WindowGroupLimit"),
      "hashSample lost its partial bottom-k:\n" + p.take(1500))
  }

  test("fuzzy pairs: block cap runs below the self-join, no cartesian") {
    val p = physical("dedup_fuzzy_pairs")
    assert(p.contains("WindowGroupLimit"),
      "per-block cap lost its partial form:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("scd2: all three windows ride one key-ordered exchange") {
    val p = physical("events_scd2")
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "scd2 grew a second shuffle:\n" + p.take(1500))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("web_adjacency: dedup, gap windows, and sum share ONE src exchange") {
    // the in-window dedup exists precisely so no (src, dst)-keyed
    // distinct shuffle precedes the src-keyed window
    val p = physical("web_adjacency")
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "web_adjacency grew a second shuffle:\n" + p.take(1500))
  }

  test("text_heavy_mg: exact recount keeps map-side partial aggregation") {
    val p = physical("text_heavy_mg")
    assert(p.contains("partial_"), "no map-side combine:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("url_shards: HRW assignment is map-only up to the final aggregate") {
    val p = physical("url_shards")
    // one exchange for the groupBy(shard); the argmax itself is a pure
    // projection (array_max over structs), never a join or a window
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "url_shards grew a shuffle beyond the final agg:\n" + p.take(1500))
    assert(!p.contains("Join"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("events_attribution: both window frames ride one user exchange") {
    val p = physical("events_attribution")
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "attribution grew a second shuffle:\n" + p.take(1500))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("geo_snap_roads: candidates stay broadcast; no cartesian dominance") {
    val p = physical("geo_snap_roads")
    // the network is the broadcast side (twice: candidates + dominance);
    // the dominance anti join must be a hash join keyed on the point id
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("LeftAnti"), "dominance argmin lost its anti join:\n" + p.take(1200))
  }

  test("ml_knn: one query-keyed exchange, partial top-k below it, train map-only") {
    val p = physical("ml_knn")
    assert(p.contains("BroadcastExchange"), p.take(800))
    // the single hash exchange is the k-NN window on query_id; the train
    // scan feeds the broadcast probe join directly
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "ml_knn grew a shuffle beyond the probe window:\n" + p.take(1500))
    // partial WindowGroupLimit below the exchange: only <=k rows per
    // (partition, query) ever shuffle
    assert(p.contains("row_number(), 5, Partial"),
      "lost the partial top-k pushdown:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

}
