"""The local mirror of the driver's t2 gate: every declared query with an
oracle must match DuckDB exactly (columns, row count, values) on the
test SF. Rows-only queries must at least run and return a stable schema.

``BRISTLE_PARITY_SHARD=i/n`` restricts the run to the i-th of n
stable-hash shards of the key list so scripts/verify_all.py can fan the
sweep out over parallel pytest processes (VERDICT r7 ask #7). Unset =
every key, exactly as before; the shards partition the key set, so the
union of all n shards is always the full sweep.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from bristle_spark.registry import all_specs


def _in_shard(name: str) -> bool:
    spec = os.environ.get("BRISTLE_PARITY_SHARD")
    if not spec:
        return True
    i, n = (int(x) for x in spec.split("/"))
    h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
    return h % n == i


SPECS = all_specs()
WITH_ORACLE = sorted(
    n for n, s in SPECS.items() if s.oracle is not None and _in_shard(n)
)
ROWS_ONLY = sorted(
    n for n, s in SPECS.items() if s.oracle is None and _in_shard(n)
)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, oracle, sf_dir):
    from tests.conftest import assert_frames_match

    spec = SPECS[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = oracle.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
