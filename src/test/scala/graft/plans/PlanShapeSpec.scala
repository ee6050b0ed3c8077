package graft.plans

import graft.SparkSpec

/** Scale-invariant plan-shape regressions over the ENTIRE query
  * surface: properties that must hold for the plan to survive a 100×
  * scale-up, asserted on the physical plan of every `SparkEntry`
  * query. A violation here is a plan knee, not a wrong answer — the
  * oracle gate can't catch it, so it's pinned here.
  */
class PlanShapeSpec extends SparkSpec {

  // one plan build per query, shared by every sweep below: the
  // executed-plan string plus the optimized-logical Window nodes
  // that run UNPARTITIONED (single-task at any scale)
  private case class PlanInfo(physical: String, globalWindows: Int)

  private lazy val plans: Map[String, PlanInfo] =
    graft.SparkEntry.queries.map { case (name, q) =>
      val qe = q(spark, sf).queryExecution
      val global = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.size
      val info = PlanInfo(qe.executedPlan.toString, global)
      spark.catalog.clearCache()
      name -> info
    }

  test("no query plan contains a CartesianProduct") {
    val offenders = plans.collect {
      case (name, info) if info.physical.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("no parquet scan reads more than 8 columns (column pruning)") {
    val scanWidth = "ReadSchema: struct<([^>]*)>".r
    val offenders = plans.collect {
      case (name, info)
          if scanWidth.findAllMatchIn(info.physical)
            .exists(_.group(1).count(_ == ',') + 1 > 8) =>
        name
    }
    assert(offenders.isEmpty, s"wide scans in: ${offenders.mkString(", ")}")
  }

  test("broadcast nested-loop joins appear only in known tiny-side sites") {
    // BNLJ is O(|left|·|right|) — acceptable ONLY where one side is a
    // handful of broadcast rows by construction: the knn/semantic
    // query-vector sides, IVF centroids, grid-blocked dedup cells,
    // the 1-row corpus-count frames in tf-idf scoring, and insight
    // frames joining a 1-row latest-year bound.
    val allowed = Set(
      "knn_brute", "knn_lsh", "knn_ivf", "semantic_search",
      "embedding_neardup", "cosine_topk_docs", "tfidf", "bm25_topk_docs",
      "lm_score", "insight_text", "insights_trend", "fastest_rising",
      "corpus_clean", "dedup_clusters",
      // round 5: chatbot_answer embeds the semantic search (1-row
      // query-norm frame); knn_qint8 broadcasts the 5-vector query
      // set; corpus_stats crosses in its broadcast 1-row corpus total
      "chatbot_answer", "knn_qint8", "corpus_stats",
      // ann_recall composes knn_brute + knn_lsh, so it inherits their
      // broadcast 5-query-vector cross joins
      "ann_recall",
      // etl_validate crosses its two 1-row per-table audit aggregates
      "etl_validate",
      // knn_classify votes over knn_brute's output, so it inherits
      // the broadcast 5-query-vector cross join
      "knn_classify",
      // pagerank crosses each round with its broadcast 1-row node
      // count (visible for the rounds since the last checkpoint)
      "pagerank",
      // q_zorder crosses its broadcast 1-row min/max bounds frame
      "q_zorder",
      // round 6: the given-quantizer IVF search crosses the 5-vector
      // query set with its broadcast 16-row pinned centroid table for
      // probe ranking (the same shape as knn_ivf's probe selection)
      "knn_ivf_given_centroids",
      // knn_pq's ADC lookup table crosses the 5-vector query set with
      // the broadcast 16-row codebook (queries × M × K rows — tiny at
      // any corpus size; candidate scoring itself is a hash equi-join)
      "knn_pq",
      // knn_ivfpq_given (the renamed pinned twin): probe ranking
      // crosses the 5 queries with the broadcast 16-row centroid
      // table, and each (query, probed list) residual crosses the
      // broadcast 16-row codebook for its ADC table — both tiny by
      // construction; residual encoding and candidate scoring are
      // hash equi-joins
      "knn_ivfpq_given",
      // knn_ivfpq (round 17, the TRAINED production path): probe
      // ranking crosses the 5 queries with the broadcast √n-row
      // trained centroid table — O(√n) rows by construction, the
      // serving-size bound; LUT scoring is a hash equi-join
      "knn_ivfpq",
      // ivfpq_recall composes knn_ivfpq_given's probe/LUT crosses
      // with the brute-force ground truth (broadcast 5-query cross
      // join, the pq_recall shape)
      "ivfpq_recall",
      // pq_recall composes knn_pq's ADC chain with the brute-force
      // ground truth (broadcast 5-query cross join, the knn_brute
      // shape)
      "pq_recall",
      // dsir_sample crosses token rows with its broadcast 1-row
      // corpus-totals aggregate (the corpus_stats shape)
      "dsir_sample",
      // hybrid_rrf composes the cosine and BM25 retrievals, so it
      // inherits their broadcast 1-row corpus-stat cross joins
      "hybrid_rrf",
      // round 12, the served-index faces: probe/LUT selection crosses
      // the query set with the broadcast 16-row loaded centroid or
      // codebook table (the knn_ivf_given_centroids / knn_pq shapes),
      // and cosine_topk_served crosses its broadcast 1-row query-norm
      // frame; ivf_list_stats crosses its broadcast 1-row totals
      "knn_ivf_served", "cosine_topk_served", "knn_pq_served",
      "ivf_list_stats",
      // knn_ivf_filtered ranks probes with the same broadcast 16-row
      // centroid cross join as knn_ivf_given_centroids; the filtered
      // candidate join itself is a (list_id, label) hash equi-join
      "knn_ivf_filtered",
      // knn_ivf_deleted is knn_ivf_served over the post-delete index:
      // same broadcast 16-row loaded-centroid probe ranking
      "knn_ivf_deleted",
      // knn_ivf_rebalanced is knn_ivf_served over the post-rebalance
      // index: same broadcast O(√n)-row loaded-centroid probe ranking
      // (round 15)
      "knn_ivf_rebalanced",
      // bm25_topk_served crosses its broadcast 1-row loaded corpus
      // stats, the same shape as bm25_topk_docs's stats frame; the
      // served hybrid composes both served retrievals' 1-row crosses
      "bm25_topk_served", "hybrid_rrf_served",
      // round 13, the sketch faces: sketch_bloom_join crosses its
      // broadcast 1-row m-selector (and the 1-row n_build/n_bits
      // frames) into the build/probe position hashing — the sketch
      // GEOMETRY, never a data side; sketch_theta_ops' pair stage is
      // a `et_a < et_b` non-equi join over the O(groups)-row bottom-K
      // sketch table (5 rows per side at the gate, O(G²·K) anywhere —
      // corpus size only enters the upstream KMV aggregate)
      "sketch_bloom_join", "sketch_theta_ops",
      // the persisted-store faces: sketch_wau's window join crosses
      // the broadcast O(days) report-day list with the O(days×groups)
      // day-state table (both sketch-artifact-sized — events never
      // enter); sketch_bloom_served inherits sketch_bloom_join's
      // 1-row geometry crosses over the LOADED meta/bits
      "sketch_wau", "sketch_bloom_served",
      // embedding_drift crosses its broadcast 1-row corpus-midpoint
      // frame and 1-row totals frame into the O(nLists) cell table
      // (the ivf_list_stats shape)
      "embedding_drift",
      // ivf_rebalance_plan inherits the assignment's broadcast
      // 16-row centroid cross, adds the 16×16 centroid-pair non-equi
      // join (O(L²) on the √n-lists frame — metadata-sized) and the
      // 1-row totals cross (round 14)
      "ivf_rebalance_plan",
      // sketch_join_card crosses its two 1-row global KMV sketch
      // aggregates (one per table side)
      "sketch_join_card",
      // key_skew_report crosses the grouped key counts with their
      // broadcast 1-row totals aggregate (the ivf_list_stats shape);
      // sketch_hh_window crosses its broadcast 1-row window-mass
      // frame for the err_budget column (round 14, same shape);
      // partition_layout_plan / range_partition_plan cross their
      // per-partition / per-bucket counts with broadcast 1-row
      // totals the same way (round 14)
      "key_skew_report", "sketch_hh_window",
      "partition_layout_plan", "range_partition_plan",
      // zone_map_report crosses its broadcast 1-row probe/n_parts
      // and n_chains/n_skippable summary frames into the
      // O(partitions)-row zone frame (round 14, same shape);
      // mixture_reweight crosses its broadcast 1-row corpus-totals
      // and keep-totals frames into the O(langs)-row plan (round 14)
      "zone_map_report", "mixture_reweight",
      // snapshot_diff_summary crosses its broadcast 1-row table-count
      // frame into the O(kinds)-row summary (round 14, same shape)
      "snapshot_diff_summary",
      // mixture_apply crosses the same broadcast 1-row corpus-totals
      // frame as mixture_reweight, plus the 1-row kept-total frame
      // into the O(langs)-row report (round 15)
      "mixture_apply",
      // round 15 session 2: bloom_index_report crosses the broadcast
      // 1-row probe-user aggregate into the O(days×words) grid and
      // the O(days) stats frames (q_bloom_join/bloom_join_stats have
      // no BNLJ at all — their word array enters the plan as a
      // constant inside the codegen'd BloomMember filter)
      "bloom_index_report",
      // join_strategy_plan crosses each candidate's O(ndv) key frame
      // with its broadcast 1-row dim-count aggregate (the
      // key_skew_report shape, six candidates unioned)
      "join_strategy_plan",
      // knn_pq_rerank inherits knn_pq's broadcast 16-row codebook
      // cross for the ADC stage; knn_ivfpq_rerank inherits
      // knn_ivfpq's centroid + codebook crosses the same way; both
      // stage-2 shortlist joins are hash equi-joins on neighbor_id
      "knn_pq_rerank", "knn_ivfpq_rerank",
      // round 16: the SERVED composed-index faces replay the same
      // probe-ranking and LUT crosses against the LOADED 16-row
      // centroid/codebook frames (tiny by construction); the
      // candidate scan is a partition-pruned hash equi-join
      "knn_ivfpq_served", "knn_ivfpq_rerank_served",
      // the appended/deleted/rebalanced gate twins serve through the
      // same loaded centroid/codebook crosses (rebalanced: ≤16 + a
      // few sub-centroid rows — still tiny by construction)
      "knn_ivfpq_appended", "knn_ivfpq_deleted",
      "knn_ivfpq_rebalanced")
    // (embedding_pca/_r left the list in round 9: the iteration moved
    // to a driver-side solve over the collected d² summary — the
    // RowMatrix.computePrincipalComponents shape — so their plans no
    // longer contain any join at all past the covariance aggregate.)
    val offenders = plans.collect {
      case (name, info)
          if info.physical.contains("BroadcastNestedLoopJoin") && !allowed(name) =>
        name
    }
    assert(offenders.isEmpty, s"unexpected BNLJ in: ${offenders.mkString(", ")}")
  }

  test("flagship aggregates keep a map-side partial phase") {
    // partial aggregation is the difference between shuffling raw
    // rows and shuffling one row per (task, group) at 100 TB
    for (name <- Seq("q1_agg", "top_countries_sum", "dedup_exact"))
      assert(plans(name).physical.contains("partial_"),
        s"$name aggregate lost its partial phase")
  }

  test("unpartitioned Windows appear only over bounded-by-construction inputs") {
    // A Window with an empty partitionSpec gathers its whole input
    // onto ONE task — fine over a frame bounded by construction
    // (top-k outputs, a per-series forecast tail, a vocab page),
    // fatal over corpus-sized input at 100 TB. Sweep the optimized
    // logical plan of every query; each allowed site is justified.
    val allowed = Set(
      // dsir_sample ranks AFTER `.limit(k)` — the window input is the
      // k=100-row Gumbel-top-k result, never the corpus
      "dsir_sample",
      // hybrid_rrf ranks the two RrfDepth-row retrieval outputs and
      // the RrfK-row fused head — all three windows ride top-k frames
      // (the served face fuses through the same rrfFuse)
      "hybrid_rrf", "hybrid_rrf_served",
      // token_ids assigns vocab ids over the VocabSize(256)-row
      // frequency head (post-limit), then broadcast-joins it back
      "token_ids",
      // zone_map_report's chain window and compaction_plan's cumsum
      // run over the O(partitions)-row LAYOUT frame — one metadata
      // row per day partition (10³-10⁵ rows at 100 TB), never event
      // rows; events enter once through the min/max/count groupBy
      "zone_map_report", "compaction_plan")
    val offenders = plans.collect {
      case (name, info) if info.globalWindows > 0 && !allowed(name) =>
        s"$name(${info.globalWindows})"
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window over unbounded input in: ${offenders.mkString(", ")}")
  }

  test("allowed unpartitioned-window inputs are bounded, mechanically") {
    // the allowlist above justifies each site in prose (top-k heads,
    // vocab pages, metadata frames); this executes every allowed
    // query's global-window CHILD and counts its rows, so the bound
    // is measured, not asserted. 4096 is far above every structural
    // bound (RrfK/RrfDepth heads, the 256-entry vocab page, the 100-
    // row Gumbel head, O(day-partitions) layout frames) and far below
    // anything corpus-shaped — a site that starts pulling data rows
    // through an unpartitioned window trips this before it ships.
    val sites = Seq("dsir_sample", "hybrid_rrf", "hybrid_rrf_served",
      "token_ids", "zone_map_report", "compaction_plan")
    for (name <- sites) {
      val qe = graft.SparkEntry.queries(name)(spark, sf).queryExecution
      val children = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w.child
      }
      assert(children.nonEmpty,
        s"$name no longer has an unpartitioned window — drop it from the allowlist")
      children.foreach { c =>
        val n = spark.sessionState.executePlan(c).executedPlan
          .execute().count()
        assert(n <= 4096L,
          s"$name feeds $n rows into an unpartitioned window")
      }
      spark.catalog.clearCache()
    }
  }

  test("flagship scans push filters down to parquet") {
    val plan = graft.analytics.Dashboard.explorerFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["),
      "explorer_filter scan lost its pushed filters")
    assert(!plan.replaceAll("PushedFilters: \\[[^\\]]*\\]", "")
      .contains("PushedFilters"), "scan printed no filter list")
  }
}
