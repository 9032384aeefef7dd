package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repeat-execution determinism for the queries where nondeterminism could
  * hide (ties under limit/top-k, window ranks, pivot, set ops, hash-based
  * candidates): two independent executions must produce byte-identical
  * ordered output — the property the driver's hash compare depends on. */
class DeterminismSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val tieProne = Seq(
    "limit_topk_global", "win_rank", "win_topk_per_group", "win_ntile_pct",
    "agg_pivot", "set_union_distinct", "text_wordcount", "sim_cosine_topk",
    "dedup_minhash_pairs", "dedup_ngram_jaccard", "tpch_q3_shipping",
    "agg_median_exact", "join_asof", "etl_dedup_lastwins", "sub_lateral",
    "sim_ann_ivf", "dedup_cluster_cc", "join_range_bucket",
    "pipe_context_pack", "pipe_corpus_curation", "pipe_decontaminate",
    "graph_pagerank", "agg_percentile_disc", "agg_corr_r2",
    "win_cohort_retention", "etl_snapshot_diff", "etl_cdc_apply",
    "join_salted_equiv", "sim_knn_graph", "text_inverted_index",
    "pipe_source_mixture", "etl_incremental_agg", "agg_linreg",
    "dedup_simhash_pairs", "agg_gini", "agg_percentile_cont",
    "etl_downsample_ohlc", "pipe_curation_e2e", "win_topk_custom",
    "win_rolling_corr", "text_collocation_lift",
    "dedup_shingle_containment", "vec_centroid_cosine", "vec_quantize_int8",
    "agg_moment_sketch", "win_running_distinct", "dedup_exact_normalized",
    "agg_weighted_median", "join_asof_tolerance", "win_ema_truncated",
    "graph_triangle_count", "tpch_q7_volume", "etl_temporal_dim_join",
    "pipe_kfold_split", "pipe_bpe_pair_counts", "agg_bitmap_distinct",
    "agg_mad_exact", "dedup_minhash_lsh_bands", "etl_zorder_key",
    "agg_outlier_robust", "sim_rp_reduce", "win_streak_longest",
    "dedup_cluster_keep_best",
    // round-2 final block
    "tpch_q17_small_qty", "tpch_q18_large_orders", "tpch_q19_bracket",
    "tpch_q22_idle_customers", "agg_hhi", "text_bm25_topk",
    "etl_partition_stats", "etl_late_arriving_dim", "pipe_dataset_card",
    "multimodal_shard_manifest", "sketch_bottomk_distinct",
    "win_session_rollup", "sql_recursive_native", "agg_skyline_pareto",
    "join_range_auto", "dedup_simhash", "ml_kmeans_assign",
    "tpch_q2_min_cost", "tpch_q8_market_share", "tpch_q9_profit",
    "tpch_q11_important_stock", "tpch_q13_custdist",
    "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q20_excess_stock", "tpch_q21_waiting",
    // round-3 continuation block: the new hash-candidate / rank-tail /
    // wide-integer queries — all deterministic by construction, pinned
    // here so a future change can't silently reintroduce tie wobble
    "sketch_cms_freq", "sketch_bottomk_intersect", "la_spgemm",
    "etl_max_concurrency", "join_bloom_prefilter", "agg_event_paths",
    "agg_event_transitions", "agg_chi2_contingency",
    "pipe_bpe_train_rounds", "win_median_sliding",
    // round-8 block: the fixture-writing rows double as overwrite-
    // idempotence proofs (bench reps re-enter them in one JVM), and the
    // theorem-graded rows must pin their flags run-over-run
    "etl_zorder_skipping", "join_bucketed_colocated",
    "sim_ann_lsh_multiprobe", "agg_hll_distinct_bound",
    "agg_heavy_hitters_bound", "sim_ann_ivf_filtered",
    "pipe_hybrid_retrieval", "sim_ann_ivf_batch",
    "etl_compact_small_files",
    // versioned-table rows: re-entry must rebuild the same log state
    // (create + merges + vacuum are guarded but the READ path replays
    // manifests every call), and the skipping row's file counts must
    // hold across repeats
    "etl_time_travel", "etl_vacuum_retention", "etl_append_evolve",
    "etl_manifest_skipping", "etl_optimize_commit")

  test("tie-prone queries are stable across repeated execution") {
    tieProne.foreach { name =>
      val q = SparkEntry.queries(name)
      val a = q(spark, TestSpark.sfDir).collect().map(_.toString).toSeq
      val b = q(spark, TestSpark.sfDir).collect().map(_.toString).toSeq
      assert(a == b, s"$name differed between executions")
      assert(a.nonEmpty || name == "join_left_anti", s"$name empty")
    }
  }
}
