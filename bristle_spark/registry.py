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
# Round 12: empty. Two round-12 refactors touched shared HELPERS, not
# plans: streaming_q's _fresh_dir (driver-side emission-dir hygiene —
# checkpointed plans unchanged, every s_* key re-verified against its
# oracle plus the new restart-replay matrix) and multimodal's
# _dims_stacks (kernel-internal stacking inside unchanged mapInPandas
# nodes — all 20 m_*/codec keys re-verified against their oracles).
PLAN_CHANGED_KEYS: tuple[str, ...] = ()

DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (1) never driver-graded: the round-12 session-3 additions ---
    "s_stream_counter_rate",
    "s_stream_geofence",
    "r_runs_test",
    "t_date32_codec",
    "r_uniq_up_to",
    "t_tuple_codec",
    "r_geohash_encode",
    "r_point_in_polygon",
    "r_spatial_grid_join",
    "l_silhouette_by_label",
    "l_centroid_drift",
    "l_retrieval_mrr",
    "m_png_hist_equalize",
    "r_mann_kendall",
    "l_bloom_fpp_eval",
    "r_window_funnel_strict",
    "t_fixed_string_codec",
    "t_datetime64_codec",
    "l_rank_biased_overlap",
    "r_topk_others",
    "r_histogram_equi_depth",
    "r_mann_whitney",
    "r_spearman_corr",
    "r_cramers_v",
    "r_counter_rate",
    "r_lttb_downsample",
    "r_bit_aggregates",
    "t_ipv6_codec",
    # --- (1) never driver-graded: the round-12 session-2 additions ---
    "l_graph_triangles",
    "l_rendezvous_shard",
    "t_ipv4_codec",
    "t_uuid_format",
    "r_recursive_hierarchy",
    "l_seq_poisson_sample",
    "r_largest_remainder_alloc",
    "m_jpeg_phash_dedup",
    # --- (1) cont.: the round-12 real-PNG promotions of
    # --- the remaining fake-backend multimodal keys (VERDICT r11 #2) ---
    "m_png_binary_features",
    "m_png_frame_sample",
    "m_png_scene_cut",
    "m_png_patchify",
    # --- (1) cont.: the baseline-JPEG codec keys (VERDICT r11 #4) ---
    "m_jpeg_pixel_stats",
    "m_jpeg_resize",
    # --- (1) cont.: deterministic augmentation through the PNG codec ---
    "m_png_augment",
    # --- (2) plan changed after last grade (see PLAN_CHANGED_KEYS) ---
    # --- (3) oldest-first drain: the round-6 cohort (graded r6) ---
    "l_ann_recall_eval",
    "l_centroid_by_label",
    "l_knn_eval",
    # --- round-7 cohort (all 27 oracle-backed keys last graded r7) ---
    "l_ann_int8_rerank",
    "l_corpus_stats",
    "l_dedup_containment",
    "l_knn_label",
    # (the remaining Group-T r7 re-confirmations and the whole r8
    # cohort rotate out this window: the twenty-eight session-3 keys take
    # rule-1 slots, and ties within the r7 cohort may drain in any
    # order)
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
