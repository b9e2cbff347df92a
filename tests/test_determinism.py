"""Double-run determinism guard: the driver hash-compares results, so
any nondeterminism (unsorted collects, fp-order drift, unstable top-k)
would make the correctness gate flaky. Run a sample of queries twice
and require canonically identical frames."""

from __future__ import annotations

import pytest

from bristle_spark.registry import all_specs
from tests.conftest import canon_frame

SPECS = all_specs()

SAMPLE = [
    "r_hash_agg",
    "r_agg_collect",
    "r_pivot",
    "l_dedup_minhash",
    "l_dedup_embedding",
    "l_similarity_cosine",
    "r_percentiles",
    "r_approx_percentiles",  # parallel sketch; output is rank-contract flags
    "l_heavy_hitters",
    "l_sessionize",
    "l_tfidf_top_terms",
    "r_rollup_cascade",
    "r_skew_salted_agg",
    "r_arg_max",
    "r_funnel",
    "r_retention",
    "r_histogram",
    "r_window_range_frame",
    # round-5 newcomers: join-heavy / window-heavy / composite shapes
    "l_repetition_score",
    "l_contamination_ngram",
    "l_cluster_representatives",
    "l_ann_knn_join",
    "l_ngram_counts",
    "l_clean_funnel",
    # round-7 newcomers: PQ argmin/codes, banded semantic pairs, winnow
    # window minima, percentile-boundary bucketing, power iteration,
    # sketch calibration, CDC diff
    "l_ann_pq",
    "l_dedup_semantic",
    "l_winnow_fingerprint",
    "l_perplexity_filter",
    "l_domain_mix",
    "l_embedding_top_component",
    "l_minhash_error",
    "r_bloom_prune",
    "r_snapshot_diff",
    "r_incremental_rollup",
    # round-6 newcomers: regex scrub, boundary-bucket stratified top-k,
    # entropy agg, containment verify join, quantized rerank
    "l_pii_scrub",
    "l_stratified_sample",
    "l_token_entropy",
    "l_dedup_containment",
    "l_ann_int8_rerank",
    # round-6 session-2 newcomers: broadcast LM scoring, bounded-window
    # regression fit, hash anti-join, positional centroid agg, unpivot
    "l_unigram_logprob",
    "l_zipf_slope",
    "l_cross_snapshot_dedup",
    "l_centroid_by_label",
    "r_unpivot",
    "l_feature_hash_embedding",
    "l_knn_eval",
    "l_ann_recall_eval",
    "l_duplicate_passages",
    "l_pack_sequences",
    "l_quality_ensemble",
    "r_robust_stats",
    "r_attribution",
    "l_span_corruption",
    # round-8 session-2 newcomers: struct-min argmax, integer-cents
    # prefix windows, basket pair mining, iterative trainers/graph,
    # one-pass bootstrap, bit-exact sketches, deflated PCA
    "r_mode_per_group",
    "r_pareto_share",
    "r_market_basket",
    "l_edit_distance_dedup",
    "l_vocab_growth",
    "l_count_min",
    "l_quality_classifier_train",
    "l_pagerank",
    "l_poisson_bootstrap",
    "r_bitmap_distinct",
    "l_pca_project",
    "l_cluster_size_histogram",
    # round-8 third wave: ECDF-grid pair join (window + self-join), 2x2
    # closed-form chi2 with top-K term cut, rank-formula Gini
    "l_ks_test",
    "l_chi2_terms",
    "r_gini",
    # blocked-SNM lead() pairs (collect_set order must not leak), MAX-CASE
    # path pivot with top-K cut
    "l_dedup_sorted_neighborhood",
    "r_top_paths",
    # double-ordered top-K cut over inverted-index dot products
    "l_sparse_cosine_topk",
    # round-11 session-2 newcomers: composed-offset global ordering
    # (broadcast predecessor join + bounded row_number), islands merge
    # over duplicated window positions, collect_list-backed map
    # aggregate (sort_array must fully determine the CSVs), decimal
    # Pearson, fixed-point decay
    "l_curriculum_order",
    "l_duplicate_spans",
    "r_summap",
    "r_autocorrelation",
    "r_exp_decay_avg",
    "l_hapax_ratio",
    "l_k_anonymity",
    # round-14 newcomers with ordering-sensitive machinery: the KM
    # left-fold product, BH (p, hour) tie ranking, SQ8 broadcast-stats
    # join + pico sums, the Allen self-join census, the KW rank window
    "r_survival_km",
    "r_benjamini_hochberg",
    "l_sq8_quantize_error",
    "r_allen_intervals",
    "r_kruskal_wallis",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_double_run_identical(name, spark, sf_dir):
    a = canon_frame(SPECS[name].fn(spark, sf_dir).toPandas())
    b = canon_frame(SPECS[name].fn(spark, sf_dir).toPandas())
    assert a == b, f"{name}: nondeterministic output"


def test_stream_dedup_exactly_once(spark, sf_dir):
    """Each event arrives twice in different micro-batches; the kept row
    set must equal the original events table exactly (exactly-once) —
    the same property the registered oracle hashes."""
    kept = SPECS["s_stream_dedup"].fn(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert kept.count() == ev.count()
    assert kept.select("event_id").distinct().count() == ev.count()


def test_stream_join_matches_batch_range_join(spark, sf_dir):
    """The stream-stream join must produce exactly the inner rows of the
    batch range join (append mode emits each matched pair once)."""
    stream = canon_frame(
        SPECS["s_stream_join"].fn(spark, sf_dir).toPandas()
    )
    batch_df = SPECS["r_range_join"].fn(spark, sf_dir)
    batch = canon_frame(
        batch_df.filter("n_clicks_10m > 0")
        .select("purchase_id", "user_id", "n_clicks_10m")
        .toPandas()
    )
    assert stream == batch


def test_m_resize_deterministic(spark, sf_dir):
    a = canon_frame(SPECS["m_png_resize"].fn(spark, sf_dir).toPandas())
    b = canon_frame(SPECS["m_png_resize"].fn(spark, sf_dir).toPandas())
    assert a == b
