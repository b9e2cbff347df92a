"""r_lttb_downsample anchor contract (ADVICE r12 + review r13): the
global first/last days anchor the output, short spans keep both, and a
single-day series emits its one point exactly ONCE."""

from __future__ import annotations

import pandas as pd
import pytest

from bristle_spark.registry import all_specs


def _events(tmp_path, days):
    rows = []
    i = 0
    for d in days:
        for _ in range(3):
            rows.append(
                {
                    "event_id": i,
                    "user_id": i % 5,
                    "event_type": "t",
                    "value": ((i * 7) % 50) / 10.0,
                    "ts": pd.Timestamp(f"2024-01-{d:02d} 12:00:00")
                    + pd.Timedelta(seconds=i),
                }
            )
            i += 1
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_single_day_series_emits_one_anchor(spark, tmp_path):
    sf = _events(tmp_path, [5])
    out = all_specs()["r_lttb_downsample"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["area"] is None  # an anchor, not a picked point


def test_short_span_keeps_both_endpoints(spark, tmp_path):
    """A 4-day span (fewer days than buckets) must still anchor on the
    global first AND last day — the ADVICE r12 regression."""
    sf = _events(tmp_path, [3, 5, 8, 11])
    out = all_specs()["r_lttb_downsample"].fn(spark, sf).collect()
    anchors = sorted(r["day_idx"] for r in out if r["area"] is None)
    # day_idx is days since 2020-01-01; Jan 2024 offsets differ per day
    assert len(anchors) == 2
    days = sorted({r["day_idx"] for r in out})
    assert anchors[0] == days[0] and anchors[1] == days[-1]
    # no duplicate (bucket, day) rows anywhere
    seen = [(r["bucket"], r["day_idx"], r["area"] is None) for r in out]
    assert len({(b, d) for b, d, _ in seen}) == len(out)
