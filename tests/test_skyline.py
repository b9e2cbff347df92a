"""r_skyline: the running-max window test must equal the O(n^2)
dominance definition on the small fixture — every front point is
undominated, every non-front point is dominated (modulo the
duplicate-representative rule), and the front is a strict staircase."""

from __future__ import annotations

import numpy as np

from bristle_spark.registry import all_specs


def _fixture(spark, sf_dir):
    from bristle_spark.catalog import load_table
    from pyspark.sql import functions as F

    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
            F.datediff(F.col("ts").cast("date"), F.lit("2020-01-01").cast("date"))
            .cast("bigint")
            .alias("day"),
        )
        .collect()
    )


def test_front_matches_dominance_definition(spark, sf_dir):
    rows = _fixture(spark, sf_dir)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["vc"], r["day"], r["event_id"]))
    got = all_specs()["r_skyline"].fn(spark, sf_dir).collect()
    front = {(r["event_type"], r["event_id"]) for r in got}
    assert front, "empty skyline"
    for et, pts in by_type.items():
        arr = np.array([(v, d) for v, d, _ in pts])
        for v, d, eid in pts:
            dominated = bool(
                (
                    (arr[:, 0] >= v)
                    & (arr[:, 1] >= d)
                    & ((arr[:, 0] > v) | (arr[:, 1] > d))
                ).any()
            )
            if (et, eid) in front:
                assert not dominated, (et, eid)
            else:
                # non-front points are dominated OR are duplicate
                # (vc, day) pairs whose lower-event_id twin represents them
                if not dominated:
                    twin = [e for vv, dd, e in pts if vv == v and dd == d]
                    assert min(twin) != eid and (et, min(twin)) in front


def test_front_is_strict_staircase(spark, sf_dir):
    got = all_specs()["r_skyline"].fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in got:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["front_rank"])
        assert [r["front_rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["value_cents"] > b["value_cents"]
            assert a["day_idx"] < b["day_idx"]
