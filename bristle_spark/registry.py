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
# Round 13: the two ADVICE r12 fixes. t_tuple_codec gained the s_back
# witness + NULL-safe fail branch (TRY_CAST oracle, when/otherwise
# roundtrip); r_lttb_downsample now anchors on the global min/max day
# (identical output at >=15-day spans, correct anchors below). The six
# retired fake-backend multimodal keys (m_binary_features,
# m_frame_sample, m_resize, m_phash_dedup, m_scene_cut, m_patchify —
# VERDICT r12 ask #3) are deletions, not plan changes: their
# real-codec twins' plans are untouched.
PLAN_CHANGED_KEYS: tuple[str, ...] = ("t_tuple_codec", "r_lttb_downsample")

DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (1) never driver-graded: round-13 additions ---
    "m_jpeg_rgb_stats",
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
    # --- (2) plan changed after last grade (see PLAN_CHANGED_KEYS) ---
    "t_tuple_codec",
    "r_lttb_downsample",
    # --- (3) oldest-first drain: the full r7 cohort (23 keys — 8 of
    # them SURVEY §2.D contract keys, stale five rounds: VERDICT r12
    # ask #2) ---
    "l_pii_scrub",
    "l_quality_ensemble",
    "l_similarity_cosine",
    "l_span_corruption",
    "l_stratified_sample",
    "l_token_entropy",
    "r_attribution",
    "r_distinct_count",
    "r_join_multi",
    "r_join_outer",
    "r_join_semi_anti",
    "r_robust_stats",
    "r_window_running",
    "s_stream_enrich",
    "s_stream_rollup",
    "s_stream_upsert",
    "t_array_ops",
    "t_bool_to_int",
    "t_enum_codes",
    "t_json_props_extract",
    "t_map_to_arrays",
    "t_null_default",
    "t_timestamp_epoch",
    # --- (3) cont.: 27 of the 41-key r8 cohort (ties within a cohort
    # may drain in any order; the 14 left wait for round 14) ---
    "l_ann_ivfpq",
    "l_ann_pq",
    "l_bm25",
    "l_char_ngram_lang_id",
    "l_dedup_embedding",
    "l_dedup_semantic",
    "l_domain_mix",
    "l_dsir_importance",
    "l_embedding_outliers",
    "l_gopher_rules",
    "l_hard_negatives",
    "l_inverted_index",
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
