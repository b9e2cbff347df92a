"""The driver's correctness harness grades the FIRST 50 queries() entries.

These tests pin the registration order. Round-6 rotation (VERDICT r5 #4):
the never-driver-checked keys and the two rounding-changed queries take
the slots of multiply-confirmed keys; the full survey pin returns in
round 7 once every registered key holds at least one driver row.
"""

from bristle_spark import registry

SURVEY_KEYS_IN_WINDOW = {
    # transcode (4 of 9 — project_rename/cast_int_widths/bool_to_int/
    # enum_codes/timestamp_epoch rotated behind with r1+r5 green rows)
    "t_null_default",
    "t_json_props_extract", "t_map_to_arrays", "t_array_ops",
    # relational (4 of 17 — the 5 join shapes, topk, rank/running
    # windows, set ops, filter_predicates, distinct_count, string_funcs,
    # and date_funcs rotated behind with r1+r5 green rows; their slots
    # went to the session-2 additions)
    "r_hash_agg", "r_approx_distinct", "r_rollup", "r_tumbling_window",
    # llm core (4)
    "l_dedup_exact", "l_text_stats", "l_similarity_cosine", "l_knn_label",
}

LLM_FAMILY_KEYS = {
    "l_dedup_ngram_jaccard", "l_dedup_embedding", "l_dedup_clusters",
}

ROUND5_ROTATION_KEYS = {
    "t_decimal_math", "t_null_semantics",
    "s_session_window", "s_stateful_totals", "s_stream_join",
    "l_repetition_score", "l_contamination_ngram",
    "l_cluster_representatives", "l_corpus_stats",
}

# Round-6 rotation: every never-driver-checked key + the two queries
# whose rounding migrated to the rN helper this round.
ROUND6_ROTATION_KEYS = {
    "l_ann_knn_join", "l_ann_ivf_nprobe", "l_ngram_counts",
    "l_clean_funnel", "s_stream_dedup", "s_stream_dedup_watermark",
    "m_binary_features", "m_frame_sample", "m_resize",
    "r_retention", "l_heavy_hitters",
}

# Round-6 session-2 additions: registered and window-slotted this round
# so every key ever registered holds a driver row by end of round 6.
ROUND6_SESSION2_KEYS = {
    "l_unigram_logprob", "l_zipf_slope", "l_cross_snapshot_dedup",
    "l_centroid_by_label", "r_unpivot", "l_knn_eval",
    "l_feature_hash_embedding", "m_audio_features", "s_stream_rollup",
    # wave 2: recall harness, passage dedup, sequence packing, BPE,
    # and the unpinned approx-percentile contract check
    "l_ann_recall_eval", "l_duplicate_passages", "l_pack_sequences",
    "l_bpe_merges", "l_bpe_tokenize", "r_approx_percentiles",
}


def test_priority_list_is_exactly_fifty():
    assert len(registry.DRIVER_PRIORITY) == 50
    assert len(set(registry.DRIVER_PRIORITY)) == 50


def test_first_fifty_covers_the_round6_window():
    first50 = list(registry.all_specs())[:50]
    assert set(first50) == (
        SURVEY_KEYS_IN_WINDOW
        | LLM_FAMILY_KEYS
        | ROUND5_ROTATION_KEYS
        | ROUND6_ROTATION_KEYS
        | ROUND6_SESSION2_KEYS
    )
    assert first50 == list(registry.DRIVER_PRIORITY)


def test_priority_keys_all_registered():
    specs = registry.all_specs()
    missing = [k for k in registry.DRIVER_PRIORITY if k not in specs]
    assert missing == []


def test_beyond_window_queries_still_registered():
    """Rotated-out queries stay registered (just past the driver window)."""
    specs = list(registry.all_specs())
    for key in ("t_project_rename", "t_cast_int_widths", "t_bool_to_int",
                "r_join_inner", "r_join_broadcast", "r_join_multi",
                "r_join_semi_anti", "r_join_outer", "r_sort_limit_topk",
                "r_window_rank", "r_window_running", "r_set_ops",
                "r_filter_predicates", "r_distinct_count",
                "r_string_funcs", "r_date_funcs",
                "t_enum_codes", "t_timestamp_epoch",
                "s_microbatch_flush", "s_drop_policies", "s_late_data",
                "s_proto_roundtrip", "l_dedup_minhash", "l_dedup_simhash",
                "l_ann_lsh", "l_ann_ivf",
                "r_funnel", "r_histogram", "r_stats_agg", "r_arg_max",
                "l_sample_hash", "l_simhash", "l_sessionize",
                "l_lang_id", "l_quality_score", "l_token_count",
                "l_chunk_documents", "l_fingerprint", "l_tfidf_top_terms",
                "l_train_val_test"):
        assert key in specs
        assert specs.index(key) >= 50
