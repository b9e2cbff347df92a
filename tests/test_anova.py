"""r_anova_oneway / r_levene_brown_forsythe must match independent
numpy computations of F and W on the same cents fixture (textbook
formulas, no quantization) — the centi-quantized integer SS assembly
may differ from float math only below the 6-dp output rounding."""

from __future__ import annotations

import numpy as np
import pytest

from bristle_spark.registry import all_specs


def _cents_by_type(spark, sf_dir):
    from bristle_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
        )
        .collect()
    )
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r["event_type"], []).append(r["vc"])
    return {k: np.array(v, dtype=np.int64) for k, v in out.items()}


def _anova_f(groups):
    n = sum(len(x) for x in groups)
    k = len(groups)
    allv = np.concatenate([x.astype(float) for x in groups])
    gm = allv.mean()
    ssb = sum(len(x) * (x.astype(float).mean() - gm) ** 2 for x in groups)
    ssw = sum(((x.astype(float) - x.astype(float).mean()) ** 2).sum() for x in groups)
    return (ssb / (k - 1)) / (ssw / (n - k)), ssb, ssw


def test_anova_matches_numpy(spark, sf_dir):
    data = _cents_by_type(spark, sf_dir)
    f_ref, ssb, ssw = _anova_f(list(data.values()))
    got = all_specs()["r_anova_oneway"].fn(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r["k"] == len(data)
    assert r["n"] == sum(len(v) for v in data.values())
    assert r["f_stat"] == pytest.approx(round(f_ref, 6), abs=2e-4)
    # centi-quantized integer SS track the float SS within k quanta
    assert r["ssb_centi"] / 100.0 == pytest.approx(ssb, rel=1e-9, abs=1.0)
    assert r["ssw_centi"] / 100.0 == pytest.approx(ssw, rel=1e-9, abs=1.0)
    assert r["eta_squared"] == pytest.approx(ssb / (ssb + ssw), abs=1e-5)


def test_brown_forsythe_matches_numpy(spark, sf_dir):
    """W computed exactly as scipy.stats.levene(center='median') up to
    the uniform 2x half-cent scaling (W is scale- and shift-invariant,
    so the key's fixed-center, 2x-scaled deviations give the same W)."""
    data = _cents_by_type(spark, sf_dir)
    zs = []
    for x in data.values():
        s = np.sort(x)
        n = len(s)
        med2 = int(s[(n + 1) // 2 - 1]) + int(s[(n + 2) // 2 - 1])
        zs.append(np.abs(2 * x - med2).astype(float))
    w_ref, _, _ = _anova_f([z.astype(np.int64) for z in zs])
    got = all_specs()["r_levene_brown_forsythe"].fn(spark, sf_dir).collect()
    assert len(got) == 1
    assert got[0]["w_stat"] == pytest.approx(round(w_ref, 6), abs=2e-4)


def test_anova_detects_planted_shift(spark, tmp_path):
    """A fixture with one group shifted far from the others must yield
    a large F and eta^2 near 1."""
    import pandas as pd

    n = 300
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "event_type": ["a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c") for i in range(n)],
            "value": [(i * 7 % 13) / 10.0 + (500.0 if i % 3 == 0 else 0.0) for i in range(n)],
            "ts": pd.date_range("2020-01-01", periods=n, freq="min"),
            "user_id": [i % 11 for i in range(n)],
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    r = all_specs()["r_anova_oneway"].fn(spark, str(tmp_path)).collect()[0]
    assert r["f_stat"] > 1000
    assert r["eta_squared"] > 0.9


def _identical_groups_fixture(tmp_path):
    import pandas as pd

    n = 60
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [i % 5 for i in range(n)],
            "event_type": ["a", "b", "c"] * (n // 3),
            # value depends only on i mod 3-coprime cycle -> every type
            # sees the same multiset: group means identical
            "value": [((i * 13) % 40) / 10.0 for i in range(n)],
            "ts": pd.to_datetime(["2024-01-05 10:00:00"] * n)
            + pd.to_timedelta(range(n), unit="s"),
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_ssb_clamped_nonnegative_on_identical_groups(spark, tmp_path):
    """Review r13: the centi quantization can undershoot by up to
    |groups| quanta when group means coincide — SSB (and therefore
    F/W/eta) must clamp at 0 instead of going negative."""
    sf = _identical_groups_fixture(tmp_path)
    a = all_specs()["r_anova_oneway"].fn(spark, sf).collect()[0]
    w = all_specs()["r_levene_brown_forsythe"].fn(spark, sf).collect()[0]
    for r, stat in ((a, "f_stat"), (w, "w_stat")):
        assert r["ssb_centi"] >= 0
        assert r[stat] >= 0.0
    assert a["eta_squared"] >= 0.0
