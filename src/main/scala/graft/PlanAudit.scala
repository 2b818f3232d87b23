package graft

import org.apache.spark.sql.SparkSession

/** Prints the physical plans of the performance-critical queries so plan
  * regressions (lost pushdown, surprise nested-loop joins, broken codegen
  * spans) are visible. Run: sbt "runMain graft.PlanAudit".
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val interesting = Seq("geo_pip", "geo_cell_counts", "geo_knn", "dedup_lsh_pairs",
      "dedup_minhash_sig", "ann_topk", "ann_lsh", "raster_convolve_sum",
      "raster_zonal_approx", "events_sessionize",
      // round 3: clip/buffer (per-feature flatMap, broadcast clip layer),
      // mixup (tile-key join), binned mode (two-pass agg + broadcast)
      "vector_clip", "vector_buffer", "aug_mixup", "raster_zonal_binned_mode",
      // round 4: salted count-distinct (two HashAggregates, partial below
      // the shuffle), cluster contraction (iterative star joins), TF-IDF
      // (WindowGroupLimit top-k), substring dedup, gz WARC scan
      "geo_cell_distinct_salted", "dedup_clusters", "text_tfidf",
      "text_substr_dedup", "warc_gz_roundtrip",
      // round 5: winnow fingerprints (map-only), cell-set compaction
      // (log-depth contraction + parent anti join, chunked generator)
      "text_winnow", "text_winnow_pairs", "geo_cell_compact",
      "geo_cell_uncompact",
      // round 5b: PageRank round (two shuffles + map-side combine),
      // weighted AllPairs cosine (prefix filter, no forced broadcast),
      // robots decision (map-only behind one broadcast join), mojibake
      // repair + DP simplify (pure per-row, zero exchanges)
      "web_pagerank", "dedup_cosine_pairs", "web_robots",
      "text_fix_encoding", "vector_simplify",
      // link-graph construction (map-only regex explode) + HITS
      // (per-half-round join + map-side-combined agg)
      "web_links", "web_hits",
      // simhash pairs: one hash-agg fingerprint + capped pigeonhole
      // band join + popcount verify before the distinct
      "dedup_simhash_pairs",
      // seeded-teleport PageRank (same 2-shuffle round as web_pagerank,
      // plus the broadcast-able seed-flag join)
      "web_trustrank",
      // frontier BFS (per-round frontier x edges equi-join + anti join)
      "web_reach",
      // eTLD+1: map-only page side behind k broadcast suffix probes
      "url_reg_domain",
      // co-citation: capped per-source window + one self-equi-join
      "web_cocite",
      // containment: prefix-filtered probe join + integer verify
      "dedup_contain_pairs",
      // boilerplate strip: line explode + doc-frequency agg + equi-join
      // back + one bounded per-doc reassembly agg
      "web_boilerplate",
      // triangles: degree-ordered orientation, wedge self-equi-join with
      // the order predicate as a join filter, closing equi-join
      "web_triangles",
      // HLL sketch: map-only register derivation + one (group, register)
      // hash agg with map-side combine; summary folds m-bounded state
      "url_host_hll",
      // collocations: map-only bigram transform, two count aggs, un-hinted
      // vocab joins, TakeOrdered top-k (never a global sort)
      "text_collocations",
      // k-core: per-round degree agg + two anti joins, lazy-checkpointed
      "web_kcore",
      // LM scoring: un-hinted left joins against the reference count
      // tables + one broadcast scalar + per-doc agg
      "text_lm_score",
      // round 5 final session: radius join (broadcast cell cover +
      // integer verify — must stay a hash equi-join), KMV bottom-k
      // (WindowGroupLimit partial trim), tile pyramid (one generator +
      // one shuffle for five levels), hotspot stencil (generator +
      // combine-friendly agg), Moran's I (two rook equi-joins + three
      // scalar aggs), bow-tie (two frontier BFS legs + left joins),
      // Q6 (pure pushdown scan)
      "geo_range_join", "url_kmv", "geo_pyramid", "geo_hotspots",
      "geo_moran", "web_bowtie", "tpch_q6",
      // self distance join (cell-bucketed pair join, AQE on hot cells),
      // SemDeDup clusters (pair join + star contraction), nearest-feature
      // join (broadcast stencil + WindowGroupLimit argmin)
      "geo_pair_join", "emb_clusters", "vector_nearest",
      // as-of join: ONE exchange, ZERO join nodes; BM25: un-hinted vocab
      // join + WindowGroupLimit; watershed: log-round doubling joins
      "events_asof", "text_bm25", "raster_watershed",
      // interval join (bucket equi + overlap-start dedup), skyline
      // (bucketed prefix-max, no dominance theta-join)
      "events_copresence", "part_skyline",
      // round 5 continuation: Q19 (residual OR after a broadcast-able dim
      // join), Q12 (join + conditional two-way combine), line ops (one
      // fid window + generator, no extra exchange), backlink (one stencil
      // equi-join + min agg), flow accumulation (halo groupByKey + entry
      // forwarding joins), readability (map-only, zero exchanges)
      "tpch_q19", "tpch_q12", "vector_densify", "vector_line_interp",
      "raster_cost_backlink", "raster_flowacc", "text_readability",
      // area-weighted zonal (broadcast zones, pixels never shuffle, one
      // map-side-combined agg) + the vector tiling cut (map-only fan-out)
      "raster_zonal_weighted", "vector_tile_clip",
      // JL sketch (map-only), trajectory (window+agg on one exchange)
      "emb_rp", "events_trajectory",
      // DBSCAN: the ε-pair cell join + degree agg + CC + border argmin —
      // every join must stay an equi-join (hot cells are AQE's job)
      "geo_dbscan", "web_modularity", "emb_kmeans", "vector_smooth", "tpch_q10", "raster_sieve", "events_wau",
      // session 3: Q21 (semi + anti on one order-key exchange family),
      // Q17 (agg-and-rejoin), Q8 (semi-join region filter + broadcast
      // dims), stump (one binned agg + broadcast dominance), hyperball
      // (register-edge join + max agg), quality containment (semi join),
      // cusum/scd2 (single-exchange windows)
      "tpch_q21", "tpch_q17", "tpch_q8", "ml_stump", "web_hyperball",
      "quality_checks", "events_cusum", "events_scd2",
      // second wave: weighted PR round, basket self-join (capped),
      // edit-distance block join (capped), hash sample (WindowGroupLimit)
      "web_pagerank_weighted", "basket_pairs", "dedup_fuzzy_pairs",
      "select_reservoir",
      // fifth session: MG exact recount (one agg + broadcast total), HRW
      // (map-only argmax), kNN eval (broadcast probe + partial top-k),
      // adjacency gap/Rice pricing (one src exchange), road snap
      // (broadcast network + id-keyed dominance anti join), attribution
      // (two frames on one user exchange), TV drift (bucket agg + tiny
      // crossJoins), zstd WARC segments (groupByKey assembly, map-only
      // parse)
      "text_heavy_mg", "url_shards", "ml_knn", "web_adjacency_rice",
      "geo_snap_roads", "events_attribution", "quality_drift",
      "warc_zstd_roundtrip")
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sf)
      df.explain("formatted")
      // simple mode shows the WholeStageCodegen spans as *(n) markers
      println("-- codegen spans --")
      df.explain(extended = false)
    }
    // the tiling pipeline plan
    println("\n========== tiling pipeline (pages->geocode->h3) ==========")
    val tiled = graft.pipeline.Pipeline.tilePages(
      graft.pipeline.Pipeline.synthPages(spark, 1000, 4), 7)
    tiled.explain("formatted")
    println("-- codegen spans --")
    tiled.explain(extended = false)
    spark.stop()
  }
}
