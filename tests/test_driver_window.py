"""The driver's correctness harness grades the FIRST 50 queries() entries.

These tests pin the registration order. Round-7 rotation (VERDICT r6
#2): the full SURVEY §2.D 33-key pin is restored, and the remaining 17
slots go to the 12 keys that had never received a driver row, the fixed
l_corpus_stats, the newly-oracle-backed s_stream_rollup, the
implementation-changed BPE pair, and the standing r_approx_distinct
rotation key.
"""

from bristle_spark import registry

SURVEY_2D_KEYS = {
    # transcode (9)
    "t_project_rename", "t_cast_int_widths", "t_bool_to_int",
    "t_enum_codes", "t_timestamp_epoch", "t_null_default",
    "t_json_props_extract", "t_map_to_arrays", "t_array_ops",
    # relational (16)
    "r_filter_predicates", "r_hash_agg", "r_distinct_count",
    "r_join_inner", "r_join_broadcast", "r_join_multi",
    "r_join_semi_anti", "r_join_outer", "r_sort_limit_topk",
    "r_window_rank", "r_window_running", "r_set_ops", "r_rollup",
    "r_string_funcs", "r_date_funcs", "r_tumbling_window",
    # llm core (4)
    "l_dedup_exact", "l_text_stats", "l_similarity_cosine", "l_knn_label",
    # streaming (4, rows-only by contract)
    "s_microbatch_flush", "s_drop_policies", "s_late_data",
    "s_proto_roundtrip",
}

NEVER_CHECKED_KEYS = {
    "l_ann_int8_rerank", "l_dedup_containment", "l_pii_scrub",
    "l_quality_ensemble", "l_span_corruption", "l_stratified_sample",
    "l_token_entropy", "m_phash_dedup", "r_attribution",
    "r_robust_stats", "s_stream_enrich", "s_stream_upsert",
}

ROUND7_EXTRA_KEYS = {
    "l_corpus_stats",     # red r5/r6; oracle HUGEINT cast fixed
    "s_stream_rollup",    # newly oracle-backed (flush-sentinel emission)
    "l_bpe_merges",       # shared-training memo landed this round
    "l_bpe_tokenize",
    "r_approx_distinct",  # standing §2.E rotation key
}


def test_priority_list_is_exactly_fifty():
    assert len(registry.DRIVER_PRIORITY) == 50
    assert len(set(registry.DRIVER_PRIORITY)) == 50


def test_survey_2d_has_exactly_33_keys():
    assert len(SURVEY_2D_KEYS) == 33


def test_first_fifty_covers_the_round7_window():
    first50 = list(registry.all_specs())[:50]
    assert set(first50) == SURVEY_2D_KEYS | NEVER_CHECKED_KEYS | ROUND7_EXTRA_KEYS
    assert first50 == list(registry.DRIVER_PRIORITY)


def test_priority_keys_all_registered():
    specs = registry.all_specs()
    missing = [k for k in registry.DRIVER_PRIORITY if k not in specs]
    assert missing == []


def test_beyond_window_queries_still_registered():
    """Rotated-out queries stay registered (just past the driver window)."""
    specs = list(registry.all_specs())
    for key in ("l_dedup_minhash", "l_dedup_simhash", "l_ann_lsh",
                "l_ann_ivf", "l_ann_knn_join", "l_ann_ivf_nprobe",
                "r_funnel", "r_histogram", "r_stats_agg", "r_arg_max",
                "r_retention", "r_unpivot", "r_approx_percentiles",
                "l_sample_hash", "l_simhash", "l_sessionize",
                "l_lang_id", "l_quality_score", "l_token_count",
                "l_chunk_documents", "l_fingerprint", "l_tfidf_top_terms",
                "l_train_val_test", "l_heavy_hitters", "l_ngram_counts",
                "l_clean_funnel", "l_cluster_representatives",
                "l_dedup_clusters", "l_dedup_embedding",
                "l_dedup_ngram_jaccard", "t_decimal_math",
                "t_null_semantics", "s_session_window",
                "s_stateful_totals", "s_stream_join", "s_stream_dedup",
                "s_stream_dedup_watermark", "m_binary_features",
                "m_frame_sample", "m_resize", "m_audio_features"):
        assert key in specs
        assert specs.index(key) >= 50
