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


def all_specs() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect registration) and return the registry."""
    from bristle_spark import queries  # noqa: F401  (populates _REGISTRY)

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
