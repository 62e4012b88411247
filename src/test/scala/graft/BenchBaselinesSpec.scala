package graft

/** Pins BASELINE.md's bar for the expensive-query baselines: every raw
  * hand-written query in Bench.baselines must produce IDENTICAL results
  * to its wrapped counterpart — otherwise the wrapped/raw timing ratio
  * compares different work. Runs on the sf0.001 tables (the smallest
  * driver-generated scale), full row-multiset equality.
  *
  * q_stream_exec is exercised by the bench itself but not here: the
  * shared test session lacks the nanos-timestamp read config the events
  * table needs (Verify/Bench sessions set it).
  */
class BenchBaselinesSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private val targets = Seq(
    "q_tpch_q1", "q_minhash_dedup", "q_simhash_dedup", "q_ngram_lsh",
    "q_cluster_rep", "q_decontaminate", "q_dedup_lines",
    "q_write_partitioned", "q_semantic_clusters", "q_ivf_topk",
    "q_salted_join", "q_salted_join_skew",
    "q_cosine_topk_scalable", "q_lsh_cosine", "q_runlog", "q_pipeline_docs",
    "q_simhash128", "q_pipeline_docs128", "q_stream_dedup",
    "q_stream_dedup_evtime", "q_stream_dedup_fullrecall",
    "q_bloom_semi", "q_bloom_anti", "q_bloom_decontaminate",
    "q_stratified_sample", "q_temperature_mix", "q_pack_shards",
    "q_pack_greedy", "q_pack_windows", "q_stream_decontaminate", "q_dedup_against",
    "q_quota_sample", "q_pack_assemble", "q_split",
    "q_tfidf", "q_bm25", "q_inverted_index", "q_bigram_pmi",
    "q_chunk", "q_fuzzy_join", "q_scd2",
    "q_topk_group", "q_pivot_wide", "q_corr_matrix",
    "q_freq_encode", "q_target_encode",
    "q_substring_dedup", "q_hybrid_search", "q_contamination_report",
    "q_keyword_tag", "q_bigram_perplexity",
    "q_first_obs", "q_window_running", "q_melt", "q_rank_numeric",
    "q_median_price", "q_weighted_arith", "q_ivf_pq_topk", "q_exact_dedup",
    "q_drift_cat", "q_pushdown_read", "q_quantize", "q_pq_topk",
    "q_det_sample", "q_expectations",
    "q_ann_persist", "q_ann_index_scan",
    "q_entropy", "q_conv_profile", "q_semantic_decontaminate",
    "q_exact_quantile",
    "q_interval_join", "q_gopher_flags", "q_bt_scores",
    "q_script_profile", "q_mmr_rerank")

  // q_asof_join reads the events table, which needs the nanos-timestamp
  // session config like q_stream_exec — checked here with the config set
  // for the read (runtime-settable legacy conf)
  for (name <- Seq("q_gap_fill", "q_rolling", "q_tumbling"))
    test(s"raw baseline produces identical results to wrapped: $name") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try {
        val wrapped = SparkEntry.queries(name)(spark, sfDir)
        val raw = Bench.baselines(name)(spark, sfDir)
        assert(wrapped.columns.toSeq == raw.columns.toSeq)
        def multiset(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        assert(multiset(wrapped) == multiset(raw))
      } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }

  for (name <- Seq("q_asof_join", "q_asof_forward"))
    test(s"raw baseline produces identical results to wrapped: $name") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try {
        val wrapped = SparkEntry.queries(name)(spark, sfDir)
        val raw = Bench.baselines(name)(spark, sfDir)
        assert(wrapped.columns.toSeq == raw.columns.toSeq)
        def multiset(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        assert(multiset(wrapped) == multiset(raw))
      } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }

  test("every Bench baseline is parity-pinned by this spec") {
    val pinned = targets.toSet ++ Seq("q_gap_fill", "q_rolling", "q_tumbling",
      "q_asof_join", "q_asof_forward",
      "q_stream_exec") // q_stream_exec: bench-exercised, see class doc
    val unpinned = Bench.baselines.keySet -- pinned
    assert(unpinned.isEmpty,
      s"baselines without a parity pin: ${unpinned.toSeq.sorted.mkString(", ")}")
  }

  for (name <- targets) {
    test(s"raw baseline produces identical results to wrapped: $name") {
      val wrapped = SparkEntry.queries(name)(spark, sfDir)
      val raw = Bench.baselines(name)(spark, sfDir)
      assert(wrapped.columns.toSeq == raw.columns.toSeq,
        s"column mismatch for $name")
      def multiset(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(multiset(wrapped) == multiset(raw), s"row multiset mismatch for $name")
    }
  }
}
