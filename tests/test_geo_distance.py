"""r_geo_distance must match an independent numpy haversine on the
SAME derived coordinates (the l_pagerank rows-only pattern: float trig
never enters a hash oracle, so the pin lives here with explicit
tolerances). The coordinate derivation itself is oracle-checked
transitively — it is shared verbatim with r_geohash_encode /
r_point_in_polygon / r_spatial_grid_join.

Tolerances: counts are exact unless a point is ulp-equidistant to two
hubs (probability ~0 over hash-uniform points, asserted exact here);
per-row meter quantization may flip by 1 where numpy and JVM libm
differ in the last ulp, so min/max allow ±1 m and the exact BIGINT
sum allows ±n m."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bristle_spark.queries.geo import GEO_HUBS, R_EARTH_M
from bristle_spark.registry import all_specs

from pyspark.sql import functions as F


def _coords(spark, sf_dir) -> np.ndarray:
    """The key's own micro-degree derivation, collected once (degrees)."""
    from bristle_spark.catalog import load_table
    from bristle_spark.queries.geo import _lat_col, _lon_col

    rows = (
        load_table(spark, sf_dir, "events")
        .select(_lat_col().alias("lat"), _lon_col().alias("lon"))
        .collect()
    )
    return np.array([[r["lat"] / 1e6, r["lon"] / 1e6] for r in rows])


def _reference(deg: np.ndarray):
    la = np.radians(deg[:, 0])[:, None]
    lo = np.radians(deg[:, 1])[:, None]
    hla = np.radians(np.array([h[1] for h in GEO_HUBS]))[None, :]
    hlo = np.radians(np.array([h[2] for h in GEO_HUBS]))[None, :]
    d = (
        2.0
        * R_EARTH_M
        * np.arcsin(
            np.sqrt(
                np.sin((la - hla) / 2) ** 2
                + np.cos(la) * np.cos(hla) * np.sin((lo - hlo) / 2) ** 2
            )
        )
    )
    nearest = d.argmin(axis=1)
    dm = np.floor(d[np.arange(len(d)), nearest] + 0.5).astype(np.int64)
    return nearest, dm


def test_matches_numpy_haversine(spark, sf_dir):
    deg = _coords(spark, sf_dir)
    assert len(deg) > 0
    nearest, dm = _reference(deg)

    got = {r["hub"]: r for r in all_specs()["r_geo_distance"].fn(spark, sf_dir).collect()}
    assert set(got) == {h[0] for h in GEO_HUBS if (nearest == GEO_HUBS.index(h)).any()}
    n = len(deg)
    for i, (name, _la, _lo) in enumerate(GEO_HUBS):
        sel = nearest == i
        if not sel.any():
            assert name not in got
            continue
        r = got[name]
        assert r["n"] == int(sel.sum())
        assert abs(r["min_m"] - int(dm[sel].min())) <= 1
        assert abs(r["max_m"] - int(dm[sel].max())) <= 1
        assert abs(r["sum_m"] - int(dm[sel].sum())) <= int(sel.sum())
        assert r["mean_km"] == pytest.approx(
            round(dm[sel].sum() / sel.sum() / 1000.0, 3), abs=0.002
        )


def test_every_point_lands_within_half_circumference(spark, sf_dir):
    """Sanity bound: no haversine output can exceed pi*R."""
    df = all_specs()["r_geo_distance"].fn(spark, sf_dir)
    top = df.agg(F.max("max_m").alias("m")).collect()[0]["m"]
    assert 0 <= top <= math.pi * R_EARTH_M + 1


def test_double_run_identical(spark, sf_dir):
    """Integer-meter quantization before aggregation makes the rollup
    shuffle-order-independent — two runs must agree bit-for-bit."""
    a = all_specs()["r_geo_distance"].fn(spark, sf_dir).collect()
    b = all_specs()["r_geo_distance"].fn(spark, sf_dir).collect()
    assert a == b
