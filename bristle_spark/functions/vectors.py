"""Vector math over array<double> columns, JVM-side only.

Dot products / norms are expressed with ``zip_with`` + ``aggregate``
(strict left-fold, deterministic fp order) so no Python UDF enters the
hot path. The matching DuckDB oracle expressions are generated here so
both engines evaluate the same formula with the same operand order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i]))"


def cosine_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    return (
        f"({dot_sql(a, b, dim)} / "
        f"(sqrt({dot_sql(a, a, dim)}) * sqrt({dot_sql(b, b, dim)})))"
    )
