"""Every registered query's output schema must survive the driver's
pandas canonicalizer (which sorts all columns with ``sort_values`` and
value-hashes the frame).

Rules (see spark-duckdb parity conventions, PARITY.md):
- no ArrayType / MapType / StructType output columns — pandas raises
  ``unhashable type: 'list'``/``'dict'`` when sorting them (the exact
  failure recorded for t_map_to_arrays, r_agg_collect and
  r_approx_percentiles in CORRECTNESS_r01) — serialize with array_join
  or flatten to scalars instead;
- no DecimalType — DuckDB's fetchdf lowers DECIMAL to float64/object
  while Spark's toPandas keeps decimal.Decimal objects, so the hash
  diverges on dtype alone — cast to DOUBLE or STRING on both sides.

Batch queries build lazy plans, so their schemas are checked without
executing anything; the s_* streaming queries necessarily EXECUTE their
(small, bounded) streams to produce the collected frame whose schema is
inspected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from bristle_spark.registry import all_specs

FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)

_SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_output_schema_is_canonicalizer_safe(spark, sf_dir, name):
    spec = _SPECS[name]
    df = spec.fn(spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, FORBIDDEN)
    ]
    assert not bad, (
        f"{name} output columns not canonicalizer-safe (driver pandas "
        f"sort/hash would fail or dtype-diverge): {bad}"
    )
