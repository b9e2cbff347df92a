"""Benchmark the declared-query suite.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the noop sink (full plan, no
driver-side collect). A tiny warmup query absorbs JVM/codegen startup so
the timings reflect steady-state execution.

Sharding / noise control (VERDICT r6 #7 — the suite now runs 60+
queries in one JVM, and accumulated fixed overhead pollutes cross-round
per-query comparisons):

  --subset shared38       only the round-1 38-query subset (the
                          cross-round comparable set in BASELINE.md)
  --family PREFIX         only queries whose name starts with PREFIX
                          (e.g. --family l_dedup, --family r_)
  --queries a,b,c         an explicit comma-separated list
  --recycle N             stop + rebuild the SparkSession every N
                          queries (JVM survives, so JIT stays warm;
                          listener/UI/broadcast-cleanup state does not
                          accumulate across the whole suite)
  --runs N                min-of-N per query (default 2)
  --cold                  fresh SparkSession per run — memo-consumer
                          rows (propagation / power-iteration / BPE
                          families) become independent of suite order;
                          BASELINE.md records cold figures separately

Defaults (no flags) are exactly what the per-round driver records.

HEADLINE wall-growth policy (VERDICT r14 ask #7, decided r15): at
+15-17 keys/round the full min-of-2 HEADLINE record crosses 5 minutes
around r17, so the cutover is decided HERE, before the wall forces it:

  * while the latest closing-gate record is under 300 s, every round
    (driver and closing) runs full HEADLINE min-of-2 — unchanged, the
    cross-round record stays maximally comparable;
  * the first round whose closing gate exceeds 300 s flips the
    DRIVER-round default to min-of-1 for keys whose query function is
    unchanged since their last green grade, keeping min-of-2 for
    changed keys plus a 20-key hash-rotated sample (seeded by round
    number, so every key is re-min-of-2'd within ~14 rounds);
  * CLOSING gates always run full HEADLINE min-of-2 regardless — the
    per-round BENCH_r{N}.json totals that BASELINE.md compares are
    closing-gate records, so the comparable series never degrades.

Status r15: gate wall 219 s < 300 s — policy written, flip not yet
triggered; the trigger is the recorded closing-gate total, not a
projection.

Measurement fix (r15): the session cache is dropped BETWEEN keys
(spark.catalog.clearCache() after each key's min-of-N). The r15
persist optimizations left CacheManager entries that inflated every
LATER key's planning time (canonicalized plan-match per cached entry;
2-5x observed on untouched keys in-suite vs isolated).

Measurement fix (r16, VERDICT r15 #1): the cache is now ALSO dropped
between the N timed runs of one key. Previously run 2 of a key whose
query fn persist()s a subtree hit run 1's CacheManager entries
(canonicalized plan match) and skipped recomputing every persisted
subtree, so the recorded min was partially cache-assisted for the ~30
persist-site keys added in r15. With the fix, every timed run computes
from the parquet inputs alone; the min now reflects warm-JVM/cold-cache
execution for every key.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# The round-1 headline set: every cross-round total in BASELINE.md
# compares on this subset.
SHARED38 = [
    "r_hash_agg", "r_filter_predicates", "r_distinct_count",
    "r_join_inner", "r_join_multi", "r_join_outer", "r_window_rank",
    "r_window_running", "r_rollup", "r_cube", "r_rollup_cascade",
    "r_skew_salted_agg", "r_tumbling_window", "r_sort_limit_topk",
    "r_percentiles", "r_asof_join", "r_range_join", "l_sessionize",
    "t_cast_int_widths", "t_map_to_arrays", "t_timestamp_epoch",
    "l_dedup_exact", "l_dedup_minhash", "l_dedup_simhash",
    "l_dedup_ngram_jaccard", "l_dedup_embedding", "l_dedup_clusters",
    "l_similarity_cosine", "l_ann_ivf", "l_chunk_documents", "r_pivot",
    "r_conditional_agg", "l_text_stats", "l_lang_id", "l_quality_score",
    "l_token_count", "l_fingerprint", "l_tfidf_top_terms",
]

HEADLINE = [
    # relational
    "r_hash_agg",
    "r_filter_predicates",
    "r_distinct_count",
    "r_join_inner",
    "r_join_multi",
    "r_join_outer",
    "r_window_rank",
    "r_window_running",
    "r_rollup",
    "r_cube",
    "r_rollup_cascade",
    "r_skew_salted_agg",
    "r_tumbling_window",
    "r_sort_limit_topk",
    "r_percentiles",
    "r_asof_join",
    "r_range_join",
    "l_sessionize",
    # transcode
    "t_cast_int_widths",
    "t_map_to_arrays",
    "t_timestamp_epoch",
    # LLM data ops
    "l_dedup_exact",
    "l_dedup_minhash",
    "l_dedup_simhash",
    "l_dedup_ngram_jaccard",
    "l_dedup_embedding",
    "l_dedup_clusters",
    "l_similarity_cosine",
    "l_ann_ivf",
    "l_chunk_documents",
    "r_pivot",
    "r_conditional_agg",
    "l_text_stats",
    "l_lang_id",
    "l_quality_score",
    "l_token_count",
    "l_fingerprint",
    "l_tfidf_top_terms",
    # round-5 additions: corpus hygiene + batch kNN join
    "l_repetition_score",
    "l_contamination_ngram",
    "l_cluster_representatives",
    "l_corpus_stats",
    "l_ann_knn_join",
    # round-6 additions: PII scrub, stratified sampling, token entropy,
    # containment dedup, int8-rerank ANN, perceptual-hash image dedup
    "l_pii_scrub",
    "l_stratified_sample",
    "l_token_entropy",
    "l_dedup_containment",
    "l_ann_int8_rerank",
    # round-6 session-2 additions: corpus LM scoring, Zipf fit,
    # cross-snapshot dedup, label centroids, unpivot, audio features
    "l_unigram_logprob",
    "l_zipf_slope",
    "l_cross_snapshot_dedup",
    "l_centroid_by_label",
    "r_unpivot",
    "m_audio_features",
    "l_feature_hash_embedding",
    "l_knn_eval",
    "l_ann_recall_eval",
    "l_duplicate_passages",
    "l_pack_sequences",
    "l_bpe_merges",
    "l_bpe_tokenize",
    "l_quality_ensemble",
    "r_robust_stats",
    "r_attribution",
    "l_span_corruption",
    # round-7 additions
    "l_domain_mix",
    "l_ann_pq",
    "l_winnow_fingerprint",
    "l_dedup_semantic",
    "l_perplexity_filter",
    "r_bloom_prune",
    "r_snapshot_diff",
    "r_incremental_rollup",
    "l_embedding_top_component",
    "l_minhash_error",
    "l_bigram_logprob",
    "l_abtt_residual",
    "l_char_ngram_lang_id",
    "r_gap_fill",
    "l_ivf_train_kmeans",
    "l_lang_id_eval",
    # round-8 additions
    "l_dsir_importance",
    "l_ngram_novelty",
    "l_inverted_index",
    "l_embedding_outliers",
    "r_ntile",
    "l_mixture_sampler",
    "l_weighted_sample",
    "l_prefix_dedup",
    "l_pmi_bigrams",
    "l_mips_topk",
    "l_matryoshka_eval",
    "l_ann_ivfpq",
    "m_audio_fingerprint",
    "l_hard_negatives",
    # round-8 backfill: every declared non-streaming key that had no
    # BENCH row in any prior round (VERDICT r7 ask #8) — with these,
    # HEADLINE == the full non-streaming registry.
    "r_approx_distinct",
    "r_approx_percentiles",
    "t_array_ops",
    "l_knn_label",
    "r_join_broadcast",
    "r_join_semi_anti",
    "r_set_ops",
    "r_string_funcs",
    "r_date_funcs",
    "r_grouping_sets",
    "r_window_lag",
    "l_heavy_hitters",
    "r_scalar_subquery",
    "r_agg_collect",
    "r_join_full",
    "r_cross_join",
    "r_window_distribution",
    "r_exists_subquery",
    "r_window_range_frame",
    "r_arg_max",
    "r_funnel",
    "r_histogram",
    "r_retention",
    "r_stats_agg",
    "t_project_rename",
    "t_bool_to_int",
    "t_enum_codes",
    "t_null_default",
    "t_json_props_extract",
    "t_decimal_math",
    "t_null_semantics",
    "l_simhash",
    "l_sample_hash",
    "l_train_val_test",
    "l_ngram_counts",
    "l_clean_funnel",
    "l_ann_lsh",
    "l_ann_ivf_nprobe",
    # round-8 second batch
    "l_bm25",
    "r_islands",
    "r_interval_coverage",
    "l_gopher_rules",
    "r_hll_merge",
    "l_mmr_diversify",
    "l_kneser_ney",
    "r_scd2",
    "l_score_calibration",
    "r_skew_salted_join",
    "l_oov_rate",
    "l_lang_confusion",
    # round-8 third batch: distributed statistical analytics
    "r_mode_per_group",
    "r_weighted_median",
    "r_pareto_share",
    "r_market_basket",
    "r_cusum_changepoint",
    "l_edit_distance_dedup",
    "l_vocab_growth",
    "l_count_min",
    "l_quality_classifier_train",
    "l_pagerank",
    "l_uncertainty_sample",
    "r_sliding_distinct",
    "l_cluster_size_histogram",
    "l_poisson_bootstrap",
    "r_bitmap_distinct",
    "l_pca_project",
    "r_time_weighted_avg",
    "l_rank_fusion",
    "l_source_overlap",
    "r_markov_transitions",
    "r_theil_sen",
    # round-8 third wave: hypothesis tests / conformity statistics
    "r_ols_by_group",
    "r_welch_ttest",
    "l_ks_test",
    "l_chi2_terms",
    "r_benford",
    "r_gini",
    "l_dedup_sorted_neighborhood",
    "r_top_paths",
    "l_sparse_cosine_topk",
    # round-9 additions
    "r_ttl_rollup",
    "r_mv_late_update",
    "r_sequence_match",
    # round-10 additions
    "r_percentile_disc",
    "r_window_funnel",
    "l_dedup_band_stats",
    "l_domain_cap",
    "r_year_over_year",
    "r_cohort_ltv",
    "l_tokenizer_fertility",
    "l_skipgram_cooccurrence",
    "r_rfm_segments",
    "r_seasonality_index",
    "r_time_to_convert",
    "l_vocab_coverage",
    "l_js_divergence",
    "l_ndcg_eval",
    "r_data_profile",
    "m_wav_audio_features",
    # round-11 additions: the real-codec image/corpus keys
    "m_png_pixel_stats",
    "m_png_resize",
    "m_png_phash_dedup",
    "l_gzip_decode_stats",
    # round-11 session-2 additions
    "m_png_edge_density",
    "r_exp_decay_avg",
    "r_autocorrelation",
    "l_hapax_ratio",
    "l_curriculum_order",
    "l_duplicate_spans",
    "r_summap",
    "l_k_anonymity",
    # round-12 additions: the remaining fake-backend keys promoted to
    # real-PNG twins
    "m_png_binary_features",
    "m_png_frame_sample",
    "m_png_scene_cut",
    "m_png_patchify",
    # round-12 additions: the baseline-JPEG stdlib codec keys
    "m_jpeg_pixel_stats",
    "m_jpeg_resize",
    "m_png_augment",
    # round-12 session-2 additions
    "l_graph_triangles",
    "r_recursive_hierarchy",
    "l_seq_poisson_sample",
    "r_largest_remainder_alloc",
    "m_jpeg_phash_dedup",
    "l_rendezvous_shard",
    "t_ipv4_codec",
    "t_uuid_format",
    "r_mann_whitney",
    "r_spearman_corr",
    "r_cramers_v",
    "r_counter_rate",
    "r_lttb_downsample",
    "r_bit_aggregates",
    "t_ipv6_codec",
    "s_stream_counter_rate",
    "l_rank_biased_overlap",
    "r_topk_others",
    "r_histogram_equi_depth",
    "r_window_funnel_strict",
    "t_fixed_string_codec",
    "t_datetime64_codec",
    "r_mann_kendall",
    "l_bloom_fpp_eval",
    "m_png_hist_equalize",
    "l_silhouette_by_label",
    "l_centroid_drift",
    "l_retrieval_mrr",
    "r_geohash_encode",
    "r_point_in_polygon",
    "r_spatial_grid_join",
    "s_stream_geofence",
    "r_uniq_up_to",
    "t_tuple_codec",
    "r_runs_test",
    "t_date32_codec",
    # round-13 additions
    "m_jpeg_rgb_stats",
    "r_geo_distance",
    "r_kendall_tau",
    "t_lowcardinality_codec",
    "t_map_codec",
    "l_dedup_url",
    "r_skyline",
    "l_ann_list_balance",
    "s_stream_skyline",
    "t_array_codec",
    "r_conversion_wilson_ci",
    "r_anova_oneway",
    "r_levene_brown_forsythe",
    "r_cuped_variance_reduction",
    # round-14 additions
    "m_jpeg_ac_stats",
    "r_kruskal_wallis",
    "r_benjamini_hochberg",
    "r_bollinger_bands",
    "r_survival_km",
    "l_sq8_quantize_error",
    "r_srm_check",
    "s_stream_srm",
    "r_peak_detection",
    "r_rolling_corr",
    "r_power_analysis",
    "r_allen_intervals",
    "l_temperature_mix",
    "r_winsorize",
    "m_wav_silence_trim",
    "r_did_estimator",
    "r_did_pretrend",
    # round-15 additions
    "m_jpeg_chroma_ac",
    "r_holt_trend",
    "s_stream_holt_trend",
    "l_graph_assortativity",
    "m_jpeg_region_count",
    "r_slo_burn_rate",
    "l_snippet_extract",
    "m_wav_resample",
    "s_stream_slo_burn",
]


def _select_queries(args: argparse.Namespace) -> list[str]:
    if args.queries:
        return [q.strip() for q in args.queries.split(",") if q.strip()]
    if args.subset == "shared38":
        return list(SHARED38)
    if args.family:
        return [n for n in HEADLINE if n.startswith(args.family)]
    return list(HEADLINE)


GATE_SF_DIR = "/root/testdata/sf0.1"  # the closing-gate scale


def is_closing_gate_run(args: argparse.Namespace, sf_dir: str | None = None) -> bool:
    """True iff this invocation's METHODOLOGY matches the committed record.

    The committed summary is the closing-gate record: full HEADLINE at
    sf0.1, warm, min-of-2, no session recycling. Scratch selections
    (--queries/--family/--subset), methodology overrides
    (--cold/--recycle/--runs), AND a different $SPARK_GRAFT_SF_DIR all
    produce numbers that are not comparable to it and must never
    clobber it (self-review + ADVICE r11, sf gap closed r12).

    Since round 14 this gate is necessary but NOT sufficient to write
    bench_summary.json: the driver's per-round run uses the gate
    methodology too, and on a loaded host it repeatedly clobbered the
    committed verified-idle record (VERDICT r11/r12/r13 hygiene nit).
    Writes to the tracked file now also require the explicit
    ``--promote`` flag; every other run lands in the untracked
    bench_scratch.json."""
    if sf_dir is not None and os.path.realpath(sf_dir) != os.path.realpath(
        GATE_SF_DIR
    ):
        return False
    return not (args.queries or args.family or args.subset
                or args.cold or args.recycle or args.runs != 2)


def summary_target(args: argparse.Namespace, sf_dir: str | None = None) -> str:
    """Which file this run's record lands in — THE promote decision
    (main() calls exactly this, and the test suite pins this function,
    not a re-implementation; self-review r14): the tracked
    bench_summary.json only on --promote AND gate methodology,
    the untracked bench_scratch.json otherwise."""
    if args.promote and is_closing_gate_run(args, sf_dir):
        return "bench_summary.json"
    return "bench_scratch.json"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    # the three selectors are mutually exclusive: silently preferring
    # one over another ran a different set than asked (ADVICE r7)
    sel = ap.add_mutually_exclusive_group()
    sel.add_argument("--subset", choices=["shared38"], default=None)
    sel.add_argument("--family", default=None)
    sel.add_argument("--queries", default=None)
    ap.add_argument("--recycle", type=int, default=0, metavar="N",
                    help="rebuild the SparkSession every N queries")
    ap.add_argument("--cold", action="store_true",
                    help="fresh SparkSession per RUN: the cross-query "
                         "memo caches key on applicationId, so a memo "
                         "consumer (l_dedup_clusters, l_pagerank, ...) "
                         "benched after its producer in one session "
                         "reads the memo and its row is not independent "
                         "(VERDICT r8 #6); --cold makes every run pay "
                         "the full propagation")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--promote", action="store_true",
                    help="write this run's record to the TRACKED "
                         "bench_summary.json (requires the closing-gate "
                         "methodology: full HEADLINE, sf0.1, warm, "
                         "min-of-2, no recycle). Without it, every run "
                         "— including the driver's per-round run — "
                         "lands in the untracked bench_scratch.json, "
                         "so a host-loaded run can never clobber the "
                         "committed verified-idle record (VERDICT "
                         "r11/r12/r13 hygiene nit)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from bristle_spark.registry import all_specs
    from bristle_spark.session import get_spark

    def fresh_session():
        spark = get_spark(app_name="bristle-spark-bench")
        # warmup: JVM, codegen, parquet footer caches
        spark.range(1000).selectExpr("sum(id)").collect()
        specs["r_hash_agg"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return spark

    specs = all_specs()
    names = _select_queries(args)
    spark = fresh_session()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for qi, name in enumerate(names):
        spec = specs.get(name)
        if spec is None:
            continue
        if args.recycle and qi and qi % args.recycle == 0:
            spark.stop()
            spark = fresh_session()
        # min of N runs: the first pays one-time codegen/JIT compilation
        # of the plan's generated classes (irrelevant at real scale and
        # very noisy locally); the min reflects steady-state execution
        best = float("inf")
        try:
            for _ in range(args.runs):
                if args.cold:
                    spark.stop()
                    spark = fresh_session()
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                # Measurement fix (r16, VERDICT r15 "What's wrong" #1):
                # drop the session cache BETWEEN the N timed runs of one
                # key, not only between keys. Spark's CacheManager
                # matches canonicalized plans, so run 2 of a key whose
                # query fn persist()s a subtree was silently reading
                # run 1's cached partitions and the recorded min was
                # partially cache-assisted. Clearing here makes every
                # timed run compute from the parquet inputs alone.
                spark.catalog.clearCache()
        except Exception as exc:  # one broken query must not zero the suite
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"[bench] {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        finally:
            # Measurement fix (r15, guide §1.1 "optimize that one thing,
            # then look again" requires each key to be measured in
            # isolation): queries that persist() multiply-consumed
            # frames leave entries in the session CacheManager, and
            # every LATER key's planning then pays a canonicalized
            # plan-match against each accumulated entry (plus storage
            # memory pressure) — measured in-suite inflation up to
            # 2-5x on untouched keys vs the same keys isolated.
            # Dropping the cache BETWEEN keys removes the cross-key
            # interference while leaving within-key min-of-N semantics
            # exactly as in every previous round's record; each key
            # still computes from the parquet inputs alone.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf_label = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label
    record = {
        "metric": "declared_query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **({"errors": errors} if errors else {}),
    }
    print(json.dumps(record))
    # the driver captures only a stdout tail, which truncates the
    # per-query map once the suite passes ~150 queries (BENCH_r8/r9
    # "parsed": null) — also persist the full record to a file so the
    # per-query history survives (VERDICT r9 ask #4). ONLY full-HEADLINE
    # runs on the closing-gate methodology (warm, min-of-2, no recycle)
    # may write it: a --queries/--family/--subset scratch run must not
    # clobber the committed record (self-review r11 — exactly that
    # clobber happened once), and neither may a --cold/--recycle/--runs
    # run, whose numbers are methodologically different even though
    # they cover every HEADLINE key (ADVICE r11).
    # Promotion rule (round 14): the tracked bench_summary.json only
    # changes on an explicit --promote AND gate methodology; everything
    # else (driver per-round runs included) persists to the untracked
    # bench_scratch.json so the full per-query map still survives the
    # driver's stdout truncation without dirtying the tree.
    repo = os.path.dirname(os.path.abspath(__file__))
    promote_refused = args.promote and not is_closing_gate_run(args, sf_dir)
    if promote_refused:
        print("[bench] --promote refused: not a closing-gate run "
              "(need full HEADLINE at sf0.1, warm, min-of-2, no recycle)",
              file=sys.stderr)
    try:
        with open(os.path.join(repo, summary_target(args, sf_dir)), "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout already carries the record
    spark.stop()
    if errors:
        # a partially-failed run sums fewer queries and would otherwise
        # read as a (better-looking) comparable total in BASELINE.md —
        # make the failure visible in the exit code (ADVICE r5)
        sys.exit(1)
    if promote_refused:
        # the caller asked for a promotion that did NOT happen — an
        # automated closing script must see that in the exit code, not
        # discover a stale tracked record later (the ADVICE r5 rule
        # applied to promotion; self-review r14)
        sys.exit(2)


if __name__ == "__main__":
    main()
