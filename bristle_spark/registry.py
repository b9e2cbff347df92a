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
# ``queries()`` in iteration order.  Round-10 rotation (VERDICT r9 ask
# #1): the 9 keys whose round-7 oracle promotion (batch-replay /
# hex-side re-derivation) has never been driver-graded take the front
# slots — their last driver row (r6) graded them rows-only, so this
# window converts the promotion into hard CORRECTNESS truth.  Next the
# two planned rotate-backs (r_string_funcs / r_date_funcs, queued here
# since round 9), then freshness ballast: with all 201 keys holding a
# green row, the highest-value remaining slots go to the STALEST keys —
# the round-2 / round-4 / round-5 cohorts whose last driver row is now
# 5-8 rounds old.  Everything rotated out keeps local oracle-parity
# coverage (test_oracle_parity.py at sf0.001/0.01/0.1).
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- the 9 stale-oracle keys (VERDICT r9 ask #1): oracle promoted
    # --- in r7/r8, last driver row r6 was rows-only ---
    "m_binary_features",
    "m_frame_sample",
    "m_resize",
    "m_audio_features",
    "s_session_window",
    "s_stateful_totals",
    "s_stream_dedup",
    "s_stream_dedup_watermark",
    "s_stream_join",
    # --- planned rotate-backs (yielded their r9 slots to the round-9
    # --- new keys; queued for r10 since then) ---
    "r_string_funcs",
    "r_date_funcs",
    # --- round-10 additions (each needs its first driver row) ---
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
    "s_stream_histogram_quantiles",
    "m_wav_audio_features",
    # --- freshness ballast (anything past slot 50 falls outside the
    # --- driver window but keeps local oracle-parity coverage) ---
    # --- freshness ballast: the entire last-checked-in-round-2 cohort
    # --- (oldest rows in the registry, 8 rounds stale) ---
    "l_sessionize",
    "r_agg_collect",
    "r_arg_max",
    "r_asof_join",
    "r_conditional_agg",
    "r_cross_join",
    "r_cube",
    "r_exists_subquery",
    "r_funnel",
    "r_grouping_sets",
    "r_histogram",
    "r_join_full",
    "r_percentiles",
    "r_pivot",
    "r_range_join",
    "r_rollup_cascade",
    "r_scalar_subquery",
    "r_skew_salted_agg",
    "r_stats_agg",
    "r_window_distribution",
    "r_window_lag",
    "r_window_range_frame",
    # --- the round-4 cohort (6 rounds stale; 5 of the 9 yielded their
    # --- slots to the third-wave round-10 additions — first driver rows
    # --- for new keys outrank re-confirmations of locally-green ones) ---
    "l_fingerprint",
)
# NOTE: the round-5 cohort (l_ann_ivf, l_ann_lsh, l_dedup_minhash,
# l_dedup_simhash) yielded its ballast slots to the four second-wave
# round-10 additions; all four keep local oracle-parity coverage AND
# the scale-shape gates (test_scale_shapes.py covers three of them).


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
