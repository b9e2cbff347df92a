"""The driver's correctness harness grades the FIRST 50 queries() entries.

These tests pin the registration order. Round-10 rotation (VERDICT r9
#1): the 9 keys whose round-7 oracle promotion has never been
driver-graded take the front slots, then the two planned rotate-backs
(r_string_funcs / r_date_funcs), then freshness ballast — the stalest
cohorts (last driver row in rounds 2/4/5) — and finally the four
round-10 additions, each needing its first driver row. Every key
rotated out keeps local oracle-parity coverage via
test_oracle_parity.py.
"""

from bristle_spark import registry

# oracle promoted in r7/r8 (batch-replay / hex-side re-derivation) but
# last driver-graded in r6 as rows-only — VERDICT r9 "What's wrong" #1
STALE_ORACLE_KEYS = {
    "m_binary_features", "m_frame_sample", "m_resize", "m_audio_features",
    "s_session_window", "s_stateful_totals", "s_stream_dedup",
    "s_stream_dedup_watermark", "s_stream_join",
}

# yielded their round-9 slots to the r9 new keys; queued for r10 since
ROTATE_BACK_KEYS = {"r_string_funcs", "r_date_funcs"}

# freshness ballast: every key whose last driver row is round 2 (the
# oldest cohort in the registry)
ROUND2_COHORT = {
    "l_sessionize", "r_agg_collect", "r_arg_max", "r_asof_join",
    "r_conditional_agg", "r_cross_join", "r_cube", "r_exists_subquery",
    "r_funnel", "r_grouping_sets", "r_histogram", "r_join_full",
    "r_percentiles", "r_pivot", "r_range_join", "r_rollup_cascade",
    "r_scalar_subquery", "r_skew_salted_agg", "r_stats_agg",
    "r_window_distribution", "r_window_lag", "r_window_range_frame",
}

# last driver row round 4 (5 of the original 9 yielded their slots to
# the third-wave round-10 additions; the displaced keys keep local
# oracle-parity coverage)
ROUND4_COHORT = {
    "l_fingerprint",
}

# brand-new in round 10 -> each needs its first driver row.  The
# second wave (YoY, cohort LTV, tokenizer fertility, skip-gram PMI)
# displaced the round-5 ballast cohort (l_ann_ivf, l_ann_lsh,
# l_dedup_minhash, l_dedup_simhash) — those keep local oracle-parity
# coverage and the scale-shape gates.
NEW_R10_KEYS = {
    "r_percentile_disc",      # exact PERCENTILE_DISC per group
    "r_window_funnel",        # ClickHouse windowFunnel semantics
    "l_dedup_band_stats",     # LSH band diagnostics for minhash dedup
    "l_domain_cap",           # per-domain frequency capping (FineWeb-style)
    "r_year_over_year",       # gap-safe period-over-period growth
    "r_cohort_ltv",           # cohort lifetime-value curve
    "l_tokenizer_fertility",  # tokens-per-word / chars-per-token by lang
    "l_skipgram_cooccurrence",  # word2vec-style windowed PMI
    "r_rfm_segments",         # threshold-bucketed RFM cube
    "r_seasonality_index",    # multiplicative monthly seasonality
    "r_time_to_convert",      # first-view -> first-purchase latency
    "l_vocab_coverage",       # top-k vocabulary token coverage
    "l_js_divergence",        # source-pair Jensen-Shannon divergence
    "l_ndcg_eval",            # NDCG@k of IVF retrieval vs exact
    "s_stream_histogram_quantiles",  # mergeable histogram quantile sketch
    "m_wav_audio_features",   # audio features through a REAL wav codec
}


def test_priority_list_is_exactly_fifty():
    assert len(registry.DRIVER_PRIORITY) == 50
    assert len(set(registry.DRIVER_PRIORITY)) == 50


def test_stale_oracle_keys_all_in_window():
    """The whole point of the round-10 rotation: every key whose oracle
    promotion lacks a hard driver row gets one this round."""
    assert STALE_ORACLE_KEYS <= set(registry.DRIVER_PRIORITY)


def test_stale_oracle_keys_lead_the_window():
    """They must sit at the very front: the driver grades in order, so
    an early abort still covers the highest-value keys."""
    assert set(registry.DRIVER_PRIORITY[:9]) == STALE_ORACLE_KEYS


def test_rotate_back_keys_in_window():
    assert ROTATE_BACK_KEYS <= set(registry.DRIVER_PRIORITY)


def test_new_r10_keys_all_in_window():
    assert NEW_R10_KEYS <= set(registry.DRIVER_PRIORITY)


def test_first_fifty_covers_the_round10_window():
    first50 = list(registry.all_specs())[:50]
    assert set(first50) == (
        STALE_ORACLE_KEYS | ROTATE_BACK_KEYS | ROUND2_COHORT
        | ROUND4_COHORT | NEW_R10_KEYS
    )
    assert first50 == list(registry.DRIVER_PRIORITY)


def test_priority_keys_all_registered():
    specs = registry.all_specs()
    missing = [k for k in registry.DRIVER_PRIORITY if k not in specs]
    assert missing == []


def test_new_r10_keys_are_oracle_backed():
    specs = registry.all_specs()
    for key in NEW_R10_KEYS:
        assert specs[key].oracle is not None, key


def test_beyond_window_queries_still_registered():
    """Rotated-out queries stay registered (just past the driver window).
    Spot-checks every round-9-window key plus a spread of older ones."""
    specs = list(registry.all_specs())
    for key in ("r_weighted_median", "r_pareto_share", "r_market_basket",
                "r_cusum_changepoint", "l_edit_distance_dedup",
                "l_vocab_growth", "l_count_min",
                "l_quality_classifier_train", "l_pagerank",
                "l_uncertainty_sample", "r_sliding_distinct",
                "s_stream_count_min", "m_patchify",
                "l_cluster_size_histogram", "l_poisson_bootstrap",
                "r_bitmap_distinct", "s_stream_bloom_merge",
                "l_pca_project", "r_time_weighted_avg", "l_rank_fusion",
                "l_source_overlap", "r_markov_transitions", "r_theil_sen",
                "r_ols_by_group", "r_welch_ttest", "l_ks_test",
                "l_chi2_terms", "r_benford", "r_gini",
                "l_dedup_sorted_neighborhood", "r_top_paths",
                "l_sparse_cosine_topk", "r_incremental_rollup",
                "l_minhash_error", "r_ttl_rollup", "r_mv_late_update",
                "r_sequence_match", "t_project_rename",
                "t_cast_int_widths", "r_filter_predicates", "r_hash_agg",
                "r_join_inner", "r_join_broadcast", "r_sort_limit_topk",
                "r_window_rank", "r_rollup", "r_set_ops",
                "r_tumbling_window", "l_dedup_exact", "l_text_stats",
                "t_bool_to_int", "t_enum_codes", "t_null_default",
                "r_join_outer", "r_join_multi", "r_join_semi_anti",
                "r_window_running", "s_microbatch_flush",
                "s_drop_policies", "s_proto_roundtrip", "t_array_ops",
                "l_similarity_cosine", "s_late_data", "t_timestamp_epoch",
                "t_json_props_extract", "t_map_to_arrays",
                "l_dedup_ngram_jaccard", "l_dedup_embedding",
                "l_dedup_clusters", "m_phash_dedup", "l_bpe_merges",
                "l_ivf_train_kmeans", "r_approx_distinct",
                "r_approx_percentiles", "r_hll_merge", "l_abtt_residual",
                "t_decimal_math", "t_null_semantics"):
        assert key in specs
        assert specs.index(key) >= 50


def test_every_window_key_is_oracle_backed():
    """Round-10 claim worth pinning: all 50 driver-window keys carry a
    DuckDB oracle, so CORRECTNESS_r10 grades 50 hash-matches — no
    rows-only slots. A future rotation placing a rows-only key in the
    window should be a deliberate, visible choice (update this test)."""
    specs = registry.all_specs()
    rows_only = [k for k in registry.DRIVER_PRIORITY if specs[k].oracle is None]
    assert rows_only == []
