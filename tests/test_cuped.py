"""r_cuped_variance_reduction must match numpy's cov/var/corrcoef on
the same per-user pre/post cents, and the rho^2 identity must hold:
var_reduction_ratio == 1 - rho_squared at output precision."""

from __future__ import annotations

import numpy as np
import pytest

from bristle_spark.queries.stats_tests import _CUPED_SPLIT
from bristle_spark.registry import all_specs


def test_matches_numpy_cov_var(spark, sf_dir):
    from bristle_spark.catalog import load_table
    from pyspark.sql import functions as F

    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    split = F.lit(_CUPED_SPLIT).cast("date")
    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(F.col("ts").cast("date") < split, cents)), F.lit(0)).alias("x"),
            F.coalesce(F.sum(F.when(F.col("ts").cast("date") >= split, cents)), F.lit(0)).alias("y"),
        )
        .collect()
    )
    x = np.array([r["x"] for r in rows], dtype=float)
    y = np.array([r["y"] for r in rows], dtype=float)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = float(np.corrcoef(x, y)[0, 1] ** 2)

    got = all_specs()["r_cuped_variance_reduction"].fn(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == len(rows)
    assert r["theta"] == pytest.approx(theta, abs=max(1e-5, 1e-4 * abs(theta)))
    assert r["rho_squared"] == pytest.approx(rho2, abs=1e-4)
    assert r["var_post"] == pytest.approx(float(np.var(y)), rel=1e-6)
    assert r["var_reduction_ratio"] == pytest.approx(1.0 - r["rho_squared"], abs=2e-6)


def test_perfectly_correlated_pre_post_reduces_all_variance(spark, tmp_path):
    """y = 3x per user -> rho^2 = 1, var_reduction_ratio = 0."""
    import pandas as pd

    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [i % 50 for i in range(n)],
            "event_type": ["t"] * n,
            # pre rows carry w, post rows carry 3w for the same user
            "value": [
                ((i % 50) + 1) * (1.0 if i < n // 2 else 3.0) for i in range(n)
            ],
            "ts": (["2024-01-02"] * (n // 2)) + (["2024-01-20"] * (n // 2)),
        }
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    r = all_specs()["r_cuped_variance_reduction"].fn(spark, str(tmp_path)).collect()[0]
    assert r["rho_squared"] == pytest.approx(1.0, abs=1e-6)
    assert r["var_reduction_ratio"] == pytest.approx(0.0, abs=1e-6)
    assert r["theta"] == pytest.approx(3.0, abs=1e-6)
