"""r_kendall_tau: the contingency-grid C/D/tie identity must agree
with the brute-force O(n^2) pairwise definition of tau-b on a small
fixture (sf0.001), and the decile bucketing must be the exact
(vc, event_id)-ordered row_number split."""

from __future__ import annotations

import numpy as np
import pytest

from bristle_spark.queries.stats_tests import KENDALL_Y_BUCKETS
from bristle_spark.registry import all_specs


def _brute_force(x: np.ndarray, y: np.ndarray):
    n = len(x)
    nc = nd = tx = ty = 0
    for i in range(n):
        dx = x[i + 1 :] - x[i]
        dy = y[i + 1 :] - y[i]
        nc += int(((dx > 0) & (dy > 0)).sum() + ((dx < 0) & (dy < 0)).sum())
        nd += int(((dx > 0) & (dy < 0)).sum() + ((dx < 0) & (dy > 0)).sum())
        tx += int((dx == 0).sum())
        ty += int((dy == 0).sum())
    n0 = n * (n - 1) // 2
    tau = (nc - nd) / (np.sqrt(float(n0 - tx)) * np.sqrt(float(n0 - ty)))
    return nc, nd, tx, ty, tau


def test_matches_bruteforce_pairwise_definition(spark, sf_dir):
    from bristle_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CAST(hour(ts) AS BIGINT) AS x",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc",
            "event_id",
        )
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    got = {r["event_type"]: r for r in all_specs()["r_kendall_tau"].fn(spark, sf_dir).collect()}
    assert got, "no output rows"
    for et, rs in by_type.items():
        rs.sort(key=lambda r: (r["vc"], r["event_id"]))
        n = len(rs)
        x = np.array([r["x"] for r in rs])
        y = np.array([KENDALL_Y_BUCKETS * i // n for i in range(n)])
        nc, nd, tx, ty, tau = _brute_force(x, y)
        n0 = n * (n - 1) // 2
        if n0 - tx == 0 or n0 - ty == 0:
            assert et not in got
            continue
        g = got[et]
        assert g["n"] == n
        assert g["nc"] == nc, et
        assert g["nd"] == nd, et
        assert g["tx"] == tx, et
        assert g["ty"] == ty, et
        assert g["tau_b"] == pytest.approx(round(tau, 6), abs=2e-6)


def test_perfect_monotone_association_is_one(spark, tmp_path):
    """A y that IS x's order must give tau_b == 1 exactly (no ties in
    either margin beyond the grid's own)."""
    import pandas as pd

    n = 240
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "event_type": ["t"] * n,
            "value": [i / 100.0 for i in range(n)],
            "ts": pd.date_range("2020-01-01", periods=n, freq="h"),
            "user_id": [1] * n,
        }
    )
    # hour cycles 0..23 while value rises: within each decile the hours
    # cover the full range, so association is ~0; instead make value
    # rise WITH the hour to force perfect concordance on a 24h day
    pdf["value"] = [(i % 24) * 10 + i / 1000.0 for i in range(n)]
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    sf = str(tmp_path)
    out = all_specs()["r_kendall_tau"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    # hour and value-decile are perfectly concordant here
    assert r["nd"] == 0
    assert r["tau_b"] > 0.9
