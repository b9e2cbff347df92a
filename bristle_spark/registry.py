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
# ``queries()`` in iteration order.  This list pins that window to the
# full SURVEY.md §2.D contract (9 t_* + 17 r_* + 4 l_* + 4 s_* = 34
# keys) plus the 16 dedup/ANN/textops operators of the LLM-pipeline
# family — exactly 50.  Queries beyond the survey that already hold
# green driver rows from earlier rounds (r_funnel, r_retention, ...)
# rotate behind, still registered and still locally oracle-checked.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- SURVEY §2.D transcode group (9) ---
    "t_project_rename",
    "t_cast_int_widths",
    "t_bool_to_int",
    "t_enum_codes",
    "t_timestamp_epoch",
    "t_null_default",
    "t_json_props_extract",
    "t_map_to_arrays",
    "t_array_ops",
    # --- SURVEY §2.D relational group (17) ---
    "r_filter_predicates",
    "r_hash_agg",
    "r_distinct_count",
    "r_approx_distinct",
    "r_join_inner",
    "r_join_broadcast",
    "r_join_multi",
    "r_join_semi_anti",
    "r_join_outer",
    "r_sort_limit_topk",
    "r_window_rank",
    "r_window_running",
    "r_set_ops",
    "r_rollup",
    "r_string_funcs",
    "r_date_funcs",
    "r_tumbling_window",
    # --- SURVEY §2.D LLM group (4) ---
    "l_dedup_exact",
    "l_text_stats",
    "l_similarity_cosine",
    "l_knn_label",
    # --- SURVEY §2.D streaming group (4, rows-only by design) ---
    "s_microbatch_flush",
    "s_drop_policies",
    "s_late_data",
    "s_proto_roundtrip",
    # --- LLM-pipeline family beyond the survey keys ---
    # Keys with multiple confirmed green driver rows (r2+r3) rotate
    # behind so changed/new/never-checked queries get driver evidence;
    # everything rotated out stays registered and locally oracle-checked
    # (test_oracle_parity.py). Rotated out in round 5: l_simhash,
    # l_sample_hash, l_lang_id, l_quality_score, l_token_count,
    # l_chunk_documents, l_fingerprint, l_tfidf_top_terms,
    # l_train_val_test.
    "l_dedup_minhash",
    "l_dedup_simhash",
    "l_dedup_ngram_jaccard",
    "l_dedup_embedding",  # banded-LSH rewrite this round — needs a fresh row
    "l_dedup_clusters",
    "l_ann_lsh",
    "l_ann_ivf",
    # --- round-5 rotation: never-driver-checked survey-adjacent keys ---
    "t_decimal_math",
    "t_null_semantics",
    # --- round-5 rotation: Group S queries refactored this round
    # (driver-collect removal) plus the never-checked stream join —
    # rows-only, but the run itself is the evidence they execute ---
    "s_session_window",
    "s_stateful_totals",
    "s_stream_join",
    # --- round-5 rotation: new corpus-hygiene family, oracle-backed ---
    "l_repetition_score",
    "l_contamination_ngram",
    "l_cluster_representatives",
    "l_corpus_stats",
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
