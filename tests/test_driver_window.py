"""The driver's correctness harness grades the FIRST 50 queries() entries.

These tests pin the registration order. Round-8 rotation (VERDICT r7
#1): the 17 round-7 keys that had no driver CORRECTNESS row take the
front slots, followed by the three keys whose contract/implementation
changed this round and any round-8 additions; the balance is
multiply-confirmed SURVEY §2.D ballast. Every key rotated out keeps
local oracle-parity coverage via test_oracle_parity.py.
"""

from bristle_spark import registry

# the 17 keys VERDICT r7 listed as driver-unchecked ("What's missing" #3)
UNCHECKED_R7_KEYS = {
    "l_abtt_residual", "l_ann_pq", "l_bigram_logprob",
    "l_char_ngram_lang_id", "l_dedup_semantic", "l_domain_mix",
    "l_embedding_top_component", "l_ivf_train_kmeans", "l_lang_id_eval",
    "l_minhash_error", "l_perplexity_filter", "l_winnow_fingerprint",
    "r_bloom_prune", "r_gap_fill", "r_incremental_rollup",
    "r_snapshot_diff", "s_stream_topk",
}

# contract or implementation changed in round 8 -> need fresh rows
CHANGED_R8_KEYS = {
    "l_dedup_embedding",     # first-colliding-band LSH rewrite
    "r_approx_distinct",     # rows-only -> contract oracle
    "r_approx_percentiles",  # rows-only -> contract oracle
}

# brand-new in round 8 -> need their first driver row
NEW_R8_KEYS = {
    "l_dsir_importance",     # DSIR hashed-unigram importance weights
    "l_ngram_novelty",       # first-occurrence shingle novelty
    "l_inverted_index",      # token postings (df/tf/serialized list)
    "l_embedding_outliers",  # centroid-distance bottom-k pruning
    "r_ntile",               # per-segment spend quartiles
    "l_mixture_sampler",     # uniform-mixture realization (hash gate)
    "l_weighted_sample",     # type-token-ratio weighted Bernoulli sample
    "l_prefix_dedup",        # first-16-token prefix-hash dedup
    "l_pmi_bigrams",         # PMI-ranked collocations
    "l_mips_topk",           # MIPS via norm augmentation
    "l_matryoshka_eval",     # truncated-dim recall@k eval
    "l_ann_ivfpq",           # IVF + residual-PQ ADC + exact rerank
    "m_audio_fingerprint",   # energy-comparison acoustic fingerprint dedup
    "s_stream_anomaly",      # broadcast-baseline streaming z-score gate
    "m_scene_cut",           # L1 frame-diff shot-boundary detection
    "l_hard_negatives",      # contrastive hard-negative mining band
    "l_bm25",                # Okapi BM25 top-k retrieval
    "r_islands",             # gaps-and-islands consecutive-day streaks
    "r_interval_coverage",   # overlapping-interval coverage merge
    "l_gopher_rules",        # hard per-rule quality gates
    "r_hll_merge",           # partial HLL sketch union (contract oracle)
    "l_mmr_diversify",       # greedy MMR re-ranking of the top-20 pool
    "s_stream_cdc",          # CDC apply with tombstoned deletes
    "l_kneser_ney",          # interpolated KN bigram LM (KenLM smoothing)
    "r_scd2",                # SCD type-2 validity-interval history build
    "l_score_calibration",   # reliability-diagram bins for quality score
    "r_skew_salted_join",    # row-level-salt skew join (post-fix)
    "l_oov_rate",            # top-N vocab coverage / OOV fraction
    "l_lang_confusion",      # classifier confusion matrix (composed SQL)
}

# the round-8 second wave took the single ballast slot (r_hash_agg is
# multiply-confirmed across r01-r07 and keeps local parity coverage);
# the remaining second-wave keys queue for the round-9 window
BALLAST_KEYS = {
    "r_mode_per_group",
}


def test_priority_list_is_exactly_fifty():
    assert len(registry.DRIVER_PRIORITY) == 50
    assert len(set(registry.DRIVER_PRIORITY)) == 50


def test_unchecked_r7_keys_all_in_window():
    """The whole point of the round-8 rotation: every key VERDICT r7
    flagged as driver-unchecked gets its row this round."""
    assert UNCHECKED_R7_KEYS <= set(registry.DRIVER_PRIORITY)


def test_changed_keys_all_in_window():
    assert CHANGED_R8_KEYS <= set(registry.DRIVER_PRIORITY)


def test_new_r8_keys_all_in_window():
    assert NEW_R8_KEYS <= set(registry.DRIVER_PRIORITY)


def test_first_fifty_covers_the_round8_window():
    first50 = list(registry.all_specs())[:50]
    assert set(first50) == (
        UNCHECKED_R7_KEYS | CHANGED_R8_KEYS | NEW_R8_KEYS | BALLAST_KEYS
    )
    assert first50 == list(registry.DRIVER_PRIORITY)


def test_priority_keys_all_registered():
    specs = registry.all_specs()
    missing = [k for k in registry.DRIVER_PRIORITY if k not in specs]
    assert missing == []


def test_beyond_window_queries_still_registered():
    """Rotated-out queries stay registered (just past the driver window)."""
    specs = list(registry.all_specs())
    for key in ("t_bool_to_int", "t_enum_codes", "t_null_default",
                "r_join_outer", "r_sort_limit_topk", "r_rollup",
                "r_tumbling_window", "s_microbatch_flush",
                "s_drop_policies", "s_proto_roundtrip",
                "t_array_ops", "r_join_inner", "l_similarity_cosine",
                "r_filter_predicates", "l_dedup_exact", "s_late_data",
                "t_project_rename", "t_cast_int_widths", "t_timestamp_epoch",
                "t_json_props_extract", "t_map_to_arrays",
                "l_dedup_minhash", "l_dedup_simhash", "l_ann_lsh",
                "l_ann_ivf", "l_ann_knn_join", "l_ann_ivf_nprobe",
                "l_ann_int8_rerank", "l_dedup_containment", "l_pii_scrub",
                "l_quality_ensemble", "l_span_corruption",
                "l_stratified_sample", "l_token_entropy", "m_phash_dedup",
                "r_attribution", "r_robust_stats", "s_stream_enrich",
                "s_stream_upsert", "l_corpus_stats", "s_stream_rollup",
                "l_bpe_merges", "l_bpe_tokenize",
                "r_funnel", "r_histogram", "r_stats_agg", "r_arg_max",
                "r_retention", "r_unpivot",
                "l_sample_hash", "l_simhash", "l_sessionize",
                "l_lang_id", "l_quality_score", "l_token_count",
                "l_chunk_documents", "l_fingerprint", "l_tfidf_top_terms",
                "l_train_val_test", "l_heavy_hitters", "l_ngram_counts",
                "l_clean_funnel", "l_cluster_representatives",
                "l_dedup_clusters", "l_dedup_ngram_jaccard",
                "l_cross_snapshot_dedup", "l_duplicate_passages",
                "t_decimal_math", "t_null_semantics", "s_session_window",
                "s_stateful_totals", "s_stream_join", "s_stream_dedup",
                "s_stream_dedup_watermark", "m_binary_features",
                "m_frame_sample", "m_resize", "m_audio_features"):
        assert key in specs
        assert specs.index(key) >= 50
