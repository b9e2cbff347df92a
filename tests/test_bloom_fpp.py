"""l_bloom_fpp_eval's docstring promises the theoretical FPP curve is
pinned by a unit test instead of an oracle column (pow() is not
bit-stable across engines): check the measured false-positive rate and
fill ratio against the exact finite-m Bloom theory within binomial
noise, via the DuckDB side (cheap — no Spark session needed; the
Spark side is hash-locked to the same result by the parity sweep)."""

from __future__ import annotations

import math

import duckdb
import pytest

from bristle_spark.registry import all_specs
from bristle_spark.queries.dedup import BLOOM_K, BLOOM_M_BITS, BLOOM_N_PROBES


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_measured_fpp_matches_theory(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"'/root/testdata/sf{sf}/orders.parquet'"
    )
    row = con.execute(all_specs()["l_bloom_fpp_eval"].oracle).df().iloc[0]
    n = int(row["n_members"])
    # exact finite-m expectation of the fill ratio (not the e^-kn/m
    # approximation): P(bit set) = 1 - (1 - 1/m)^(k*n)
    p_set = 1.0 - (1.0 - 1.0 / BLOOM_M_BITS) ** (BLOOM_K * n)
    theory_fpp = p_set**BLOOM_K
    # fill ratio concentrates hard around p_set (m=4096 Bernoulli bits)
    assert abs(row["fill_ratio"] - p_set) < 0.03
    # measured FPP within 4 binomial standard errors of theory (the
    # probes are i.i.d. w.r.t. the hash; 4 sigma keeps this deterministic
    # test honest without flaking on the fixed fixture)
    se = math.sqrt(max(theory_fpp * (1 - theory_fpp), 1e-9) / BLOOM_N_PROBES)
    assert abs(row["measured_fpp"] - theory_fpp) < 4 * se + 1e-3, (
        row["measured_fpp"],
        theory_fpp,
    )
    # structural sanity: occupancy can never exceed k*n or m
    assert int(row["occupied_bits"]) <= min(BLOOM_M_BITS, BLOOM_K * n)
