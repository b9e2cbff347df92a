"""Declared-query registry: the t2 correctness contract (SURVEY.md §2.D).

Every implemented operator registers a ``QuerySpec``:
    fn(spark, sf_dir) -> DataFrame   (the Spark-first implementation)
    oracle: ANSI SQL string DuckDB can run on the same parquet tables,
            or None for non-SQL-expressible ops (rows-only check).

``__spark_entry__.py`` exposes this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    group: str
    doc: str


def register(name: str, oracle: str | None = None, group: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, group=group or name.split("_", 1)[0], doc=fn.__doc__ or ""
        )
        return fn

    return deco


# The driver's correctness harness grades the FIRST 50 entries of
# ``queries()`` in iteration order.  Round-11 rotation (VERDICT r10 ask
# #1), policy codified in tests/test_driver_window.py: (1) keys with NO
# driver row ever lead the window, (2) then keys whose query plan
# changed after their last driver grade, (3) then the window drains
# strictly oldest-first over the oracle-backed registry (computed from
# the committed CORRECTNESS_r*.json history).  Everything rotated out
# keeps local oracle-parity coverage (test_oracle_parity.py at
# sf0.001/0.01/0.1, scripts/verify_all.py every round).

# keys whose query function was touched in THIS round after their last
# driver grade — the rotation policy forces them into the next window.
# Round 11: 996b8b2 (r10) persisted the counts frames consumed by the
# first three (last driver row r8 predates that plan change), and the
# round-11 banding refactor (_phash_band_pairs) touched m_phash_dedup
# (last driver row r7).
PLAN_CHANGED_KEYS: tuple[str, ...] = (
    "l_pmi_bigrams",
    "l_bigram_logprob",
    "l_kneser_ney",
    "m_phash_dedup",
)

DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (1) never driver-graded: r_data_profile landed after the r10
    # --- window was pinned; the m_png_*/l_gzip/edge/decay/acf/hapax
    # --- keys are new this round ---
    "r_data_profile",
    "m_png_pixel_stats",
    "m_png_resize",
    "m_png_phash_dedup",
    "l_gzip_decode_stats",
    "m_png_edge_density",
    "r_exp_decay_avg",
    "r_autocorrelation",
    "l_hapax_ratio",
    "l_curriculum_order",
    "s_stream_decayed_ltv",
    "l_duplicate_spans",
    "r_summap",
    "l_k_anonymity",
    # --- (2) plan changed after last grade (see PLAN_CHANGED_KEYS) ---
    "l_pmi_bigrams",
    "l_bigram_logprob",
    "l_kneser_ney",
    "m_phash_dedup",
    # --- (3) oldest-first drain: the round-4 cohort (7 rounds stale) ---
    "l_simhash",
    "l_lang_id",
    "l_quality_score",
    "l_token_count",
    "l_chunk_documents",
    "l_tfidf_top_terms",
    "l_sample_hash",
    "l_train_val_test",
    # --- round-5 cohort ---
    "l_dedup_minhash",
    "l_dedup_simhash",
    "l_ann_lsh",
    "l_ann_ivf",
    # --- round-6 cohort (all 23 oracle-backed r6 keys) ---
    "l_heavy_hitters",
    "r_retention",
    "r_unpivot",
    "t_decimal_math",
    "t_null_semantics",
    "l_dedup_ngram_jaccard",
    "l_dedup_clusters",
    "l_feature_hash_embedding",
    "l_repetition_score",
    "l_contamination_ngram",
    "l_cluster_representatives",
    "l_ngram_counts",
    "l_clean_funnel",
    "l_unigram_logprob",
    "l_zipf_slope",
    "l_cross_snapshot_dedup",
    "l_duplicate_passages",
    "l_pack_sequences",
    "l_ann_knn_join",
    "l_ann_ivf_nprobe",
)


def all_specs() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect registration) and return the registry.

    The returned dict is ordered: ``DRIVER_PRIORITY`` keys first (in that
    order), then every remaining registration in module-import order.
    """
    from bristle_spark import queries  # noqa: F401  (populates _REGISTRY)

    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
