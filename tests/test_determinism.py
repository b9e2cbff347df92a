"""Double-run determinism guard: the driver hash-compares results, so
any nondeterminism (unsorted collects, fp-order drift, unstable top-k)
would make the correctness gate flaky. Run a sample of queries twice
and require canonically identical frames."""

from __future__ import annotations

import pytest

from bristle_spark.registry import all_specs
from tests.conftest import canon_frame

SPECS = all_specs()

SAMPLE = [
    "r_hash_agg",
    "r_agg_collect",
    "r_pivot",
    "l_dedup_minhash",
    "l_dedup_embedding",
    "l_similarity_cosine",
    "r_percentiles",
    "r_approx_percentiles",  # sketch pinned to deterministic layout
    "l_heavy_hitters",
    "l_sessionize",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_double_run_identical(name, spark, sf_dir):
    a = canon_frame(SPECS[name].fn(spark, sf_dir).toPandas())
    b = canon_frame(SPECS[name].fn(spark, sf_dir).toPandas())
    assert a == b, f"{name}: nondeterministic output"


def test_stream_dedup_exactly_once(spark, sf_dir):
    r = SPECS["s_stream_dedup"].fn(spark, sf_dir).collect()[0]
    assert r["exactly_once"] == 1
    assert r["n_batches"] >= 4  # duplicates arrived in separate batches
    assert r["rows_kept"] == r["distinct_events"]
