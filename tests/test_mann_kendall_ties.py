"""Constructed-fixture regression for r_mann_kendall's tie path.

The driver fixtures happen to contain zero tied daily totals at every
committed SF (each event type's daily cents are all distinct), so the
sf parity sweep can pass while the tie-handling arms (tie_var,
tie_pairs, and n_days = Σt vs the number of DISTINCT totals) silently
diverge between the Spark side and the oracle — exactly the bug a
session-3 review caught: the oracle computed n from count(*) over the
per-value tie groups (distinct totals) instead of sum(t) (days).

This fixture plants equal daily totals on purpose and asserts full
parity plus the hand-derived statistics."""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bristle_spark.registry import all_specs
from tests.conftest import assert_frames_match


def _events_with_tied_daily_totals():
    """One event type, 4 days with daily cents [1000, 1000, 2000, 500]:
    a tie between days 0 and 1, a rise, then a fall.

    Hand derivation: pairs (d_i < d_j), sign(c_j - c_i):
      (0,1)=0  (0,2)=+1 (0,3)=-1 (1,2)=+1 (1,3)=-1 (2,3)=-1  -> S = -1
      n=4; ties: one group of t=2 ->
      tie_var = 2*1*9 = 18; tie_pairs = 2
      var = (4*3*13 - 18)/18 = 138/18
      z = (S+1)/sqrt(var) = 0
      tau_b = -1 / (sqrt(6 - 1) * sqrt(6)) = -1/sqrt(30)
    """
    days = [0, 1, 2, 3]
    cents = [1000, 1000, 2000, 500]
    eid, ts, val = [], [], []
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    for d, c in zip(days, cents):
        eid.append(len(eid))
        ts.append(base + datetime.timedelta(days=d))
        val.append(c / 100.0)
    n = len(eid)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def tied_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mk_ties_sf")
    pq.write_table(_events_with_tied_daily_totals(), str(d / "events.parquet"))
    return str(d)


def test_mann_kendall_parity_on_tied_totals(spark, tied_dir):
    spec = all_specs()["r_mann_kendall"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tied_dir}/events.parquet')"
    )
    spark_pdf = spec.fn(spark, tied_dir).toPandas()
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, "r_mann_kendall[tied]")
    row = spark_pdf.iloc[0]
    assert int(row["n_days"]) == 4  # Σt, NOT the 3 distinct totals
    assert int(row["s_stat"]) == -1
    assert row["z_score"] == 0.0
    import math

    expected_tau = -1.0 / (math.sqrt(5.0) * math.sqrt(6.0))
    assert abs(row["tau_b"] - expected_tau) < 1e-6


def test_committed_fixtures_have_no_daily_total_ties():
    """Documents WHY the sweep alone could not catch the bug: if a
    future fixture regeneration introduces tied daily totals, the main
    parity sweep takes over the tie path and this canary flags that the
    constructed fixture is no longer the only tie coverage."""
    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        ties = con.execute(
            f"""
            WITH daily AS (
                SELECT event_type,
                       date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS d,
                       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
                FROM read_parquet('/root/testdata/sf{sf}/events.parquet')
                GROUP BY 1, 2
            )
            SELECT count(*) FROM (
                SELECT event_type, c FROM daily
                GROUP BY event_type, c HAVING count(*) > 1
            )
            """
        ).fetchone()[0]
        assert ties == 0, f"sf{sf} now has tied daily totals"
