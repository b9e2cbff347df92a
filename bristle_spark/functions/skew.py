"""Skew mitigation: salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins at runtime; salting is the explicit lever for skewed
*aggregations* and broadcast-ineligible joins. Both helpers preserve
exact results:

- ``salted_agg``: two-phase aggregation — partial aggregate on
  (key, salt), final aggregate on key. A key with 10^9 rows becomes
  ``buckets`` partial groups that reduce in parallel instead of one
  straggler task.
- ``salted_join``: explode the small side once per salt value so the
  big side's salted keys still match. Costs |small| x buckets rows —
  only worth it for genuinely hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a stable row hash (not rand():
    retries/speculative tasks must salt identically)."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(buckets))
    return df.withColumn(col_name, salt)


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: "dict[str, str] | list[tuple[str, str]]",
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates
    (sum/count/min/max: partials combine exactly). ``agg_exprs`` is a
    {col: fn} dict or, when one column needs several aggregates, a list
    of (col, fn) pairs."""
    items = list(agg_exprs.items()) if isinstance(agg_exprs, dict) else list(agg_exprs)
    partial_exprs = []
    final_exprs = []
    for col, fn in items:
        partial_name = f"_p_{fn}_{col}"  # unique per (col, fn) pair
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(partial_name))
            final_exprs.append(F.sum(partial_name).alias(f"count_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(partial_name))
            final_exprs.append(F.sum(partial_name).alias(f"sum_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(partial_name))
            final_exprs.append(F.min(partial_name).alias(f"min_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(partial_name))
            final_exprs.append(F.max(partial_name).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: Column,
    small_key: Column,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi join: salt the large side, replicate the small
    side across all salt values, join on (key, salt).

    The salt MUST be row-level (hash of the whole row), not a hash of
    the join key: a hot key hashes to ONE salt value and would still
    land on a single reducer, defeating the replication entirely (r8
    fix — the original keyed salt preserved results but provided zero
    skew relief)."""
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*large.columns), F.lit(buckets))
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    cond = (large_key == small_key) & (salted_large["_salt"] == replicated["_salt"])
    return salted_large.join(replicated, cond).drop("_salt")
