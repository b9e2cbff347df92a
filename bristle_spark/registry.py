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
# Round 14: none yet.
PLAN_CHANGED_KEYS: tuple[str, ...] = ()

DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (1) never driver-graded: round-14 additions ---
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
    # --- (1a) deliberate rows-only slot (VERDICT r13 ask #4):
    # r_geo_distance is the only registered key with zero driver
    # history; rows-only keys are window-exempt by policy, so this is
    # its one deliberate driver run (records a no_oracle row, proving
    # the key runs under the driver like the 12 other rows-only keys
    # did in r7–r9). Carve-out documented in
    # tests/test_driver_window.py::test_every_window_key_is_oracle_backed.
    "r_geo_distance",
    # --- (3) oldest-first drain: the full r8 cohort (29 keys — incl.
    # the §2.D contract key r_approx_distinct, VERDICT r13 ask #1) ---
    "r_approx_distinct",
    "l_lang_confusion",
    "l_lang_id_eval",
    "l_matryoshka_eval",
    "l_mips_topk",
    "l_mixture_sampler",
    "l_mmr_diversify",
    "l_ngram_novelty",
    "l_oov_rate",
    "l_perplexity_filter",
    "l_prefix_dedup",
    "l_score_calibration",
    "l_weighted_sample",
    "l_winnow_fingerprint",
    "m_audio_fingerprint",
    "r_approx_percentiles",
    "r_bloom_prune",
    "r_gap_fill",
    "r_hll_merge",
    "r_interval_coverage",
    "r_islands",
    "r_mode_per_group",
    "r_ntile",
    "r_scd2",
    "r_skew_salted_join",
    "r_snapshot_diff",
    "s_stream_anomaly",
    "s_stream_cdc",
    "s_stream_topk",
    # --- (3) cont.: 3 of the 46-key r9 cohort (ties within a cohort
    # may drain in any order; the remaining 43 wait for round 15 —
    # this round's 17 never-graded additions took the other slots) ---
    "r_filter_predicates",
    "r_join_inner",
    "t_project_rename",
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
