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
# ``queries()`` in iteration order.  Round-6 rotation (VERDICT r5 #4):
# every key that has NEVER received a driver row gets a slot this round
# — l_ann_knn_join, l_ann_ivf_nprobe, l_ngram_counts, l_clean_funnel,
# s_stream_dedup(+_watermark), m_* — plus the two queries whose rounding
# changed this round (r_retention, l_heavy_hitters).  Slots come from
# multiply-confirmed keys (l_ann_lsh, l_ann_ivf, l_dedup_minhash,
# l_dedup_simhash, the 4 survey s_* with two green runs, and 3 t_* with
# r1+r5 green rows); everything rotated out stays registered and locally
# oracle-checked (test_oracle_parity.py).  The full survey pin is
# restored in round 7 once every key holds >=1 driver row.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- SURVEY §2.D transcode group (4 of 9; project_rename,
    # cast_int_widths, bool_to_int, enum_codes, timestamp_epoch rotate
    # behind with r1+r5 green rows) ---
    "t_null_default",
    "t_json_props_extract",
    "t_map_to_arrays",
    "t_array_ops",
    # --- SURVEY §2.D relational group (filter_predicates,
    # distinct_count, string_funcs, date_funcs also rotate behind with
    # r1+r5 green rows) ---
    "r_hash_agg",
    "r_approx_distinct",
    # (r_join_inner/broadcast/multi/semi_anti/outer, r_sort_limit_topk,
    # r_window_rank/running, r_set_ops rotate behind with r1+r5 green
    # rows — their 9 slots go to the session-2 never-checked keys below)
    "r_rollup",
    "r_tumbling_window",
    # --- SURVEY §2.D LLM group (4) ---
    "l_dedup_exact",
    "l_text_stats",  # rounding migrated to r6 this round — fresh row
    "l_similarity_cosine",
    "l_knn_label",
    # --- LLM-pipeline family still inside the window ---
    "l_dedup_ngram_jaccard",
    "l_dedup_embedding",
    "l_dedup_clusters",
    # --- round-5 rotation keys keeping their slots (1 green row each) ---
    "t_decimal_math",
    "t_null_semantics",
    "s_session_window",
    "s_stateful_totals",
    "s_stream_join",
    "l_repetition_score",
    "l_contamination_ngram",
    "l_cluster_representatives",
    "l_corpus_stats",  # the round-5 red row — rN(d=4) fix needs its green
    # --- round-6 rotation: never-driver-checked keys ---
    "l_ann_knn_join",
    "l_ann_ivf_nprobe",
    "l_ngram_counts",
    "l_clean_funnel",
    "s_stream_dedup",
    "s_stream_dedup_watermark",
    "m_binary_features",
    "m_frame_sample",
    "m_resize",
    # --- round-6 rotation: rounding changed this round, need fresh rows ---
    "r_retention",
    "l_heavy_hitters",
    # --- round-6 session-2 additions: never driver-checked, all locally
    # oracle-verified at sf0.001/0.01/0.1 (or rows-only by design) ---
    "l_unigram_logprob",
    "l_zipf_slope",
    "l_cross_snapshot_dedup",
    "l_centroid_by_label",
    "r_unpivot",
    "l_knn_eval",
    "l_feature_hash_embedding",
    "m_audio_features",
    "s_stream_rollup",
    # --- round-6 session-2 wave 2: never driver-checked, all locally
    # verified (oracle or reference-implementation-pinned) ---
    "l_ann_recall_eval",
    "l_duplicate_passages",
    "l_pack_sequences",
    "l_bpe_merges",
    "l_bpe_tokenize",
    "r_approx_percentiles",
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
