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
# Round 15: the five ADVICE fixes (exact winsorize ranks, idempotent
# srm/count-min landings, KW headroom guard), the k-means contract
# promotion (output changed from the long centroid form to the
# contract frame), every m_* key (the narrow-scan kernel rebalance
# added a conditional RoundRobin exchange to each codec plan), and —
# from the self-review sweep — the REST of the foreachBatch streaming
# family, whose sinks all moved to the batch_id-keyed idempotent
# landing (only the OR-merge bloom and the dominance-absorbing skyline
# keep plain appends: duplicates are absorbed by their merges).  The
# shared-epoch refactor (functions/timebase.py) is NOT plan-changed:
# the spliced SQL text and Spark plans are byte-identical.
PLAN_CHANGED_KEYS: tuple[str, ...] = (
    "r_winsorize",
    "s_stream_srm",
    "s_stream_count_min",
    "s_session_window",
    "s_stream_dedup",
    "s_stream_dedup_watermark",
    "s_stateful_totals",
    "s_stream_join",
    "s_stream_enrich",
    "s_stream_rollup",
    "s_stream_topk",
    "s_stream_anomaly",
    "s_stream_histogram_quantiles",
    "s_stream_decayed_ltv",
    "s_stream_counter_rate",
    "s_stream_geofence",
    "r_kruskal_wallis",
    "l_ivf_train_kmeans",
    "m_jpeg_ac_stats",
    "m_wav_silence_trim",
    "m_audio_fingerprint",
    "m_audio_features",
    "m_wav_audio_features",
    "m_png_binary_features",
    "m_png_frame_sample",
    "m_png_resize",
    "m_png_phash_dedup",
    "m_png_scene_cut",
    "m_png_patchify",
    "m_png_pixel_stats",
    "m_png_augment",
    "m_png_edge_density",
    "m_png_hist_equalize",
    "m_jpeg_pixel_stats",
    "m_jpeg_resize",
    "m_jpeg_phash_dedup",
    "m_jpeg_rgb_stats",
)

DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (1) never driver-graded: round-15 additions ---
    "m_jpeg_chroma_ac",
    "r_holt_trend",
    "s_stream_holt_trend",
    "l_graph_assortativity",
    "m_jpeg_region_count",
    "r_slo_burn_rate",
    "l_snippet_extract",
    "m_wav_resample",
    "s_stream_slo_burn",
    # --- (2) plan-changed after their last grade (PLAN_CHANGED_KEYS) ---
    "r_winsorize",
    "s_stream_srm",
    "s_stream_count_min",
    "s_session_window",
    "s_stream_dedup",
    "s_stream_dedup_watermark",
    "s_stateful_totals",
    "s_stream_join",
    "s_stream_enrich",
    "s_stream_rollup",
    "s_stream_topk",
    "s_stream_anomaly",
    "s_stream_histogram_quantiles",
    "s_stream_decayed_ltv",
    "s_stream_counter_rate",
    "s_stream_geofence",
    "r_kruskal_wallis",
    "l_ivf_train_kmeans",
    "m_jpeg_ac_stats",
    "m_wav_silence_trim",
    "m_audio_fingerprint",
    "m_audio_features",
    "m_wav_audio_features",
    "m_png_binary_features",
    "m_png_frame_sample",
    "m_png_resize",
    "m_png_phash_dedup",
    "m_png_scene_cut",
    "m_png_patchify",
    "m_png_pixel_stats",
    "m_png_augment",
    "m_png_edge_density",
    "m_png_hist_equalize",
    "m_jpeg_pixel_stats",
    "m_jpeg_resize",
    "m_jpeg_phash_dedup",
    "m_jpeg_rgb_stats",
    # --- (3) oldest-first drain: 4 of the 42 remaining r9-cohort
    # oracle-backed keys (ties within a cohort may drain in any order;
    # the remaining 38 wait for round 16 — the self-review's streaming
    # idempotency sweep took 13 slots as mandatory re-grades) ---
    "l_chi2_terms",
    "l_count_min",
    "l_dedup_exact",
    "l_sparse_cosine_topk",
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
