"""Stateful streaming operator + skew-salting helpers + property-based
transcode round-trip (SURVEY.md §5 strategy item 4)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bristle_spark.catalog import load_table
from bristle_spark.registry import all_specs

SPECS = all_specs()


def test_stateful_totals_match_batch_agg(spark, sf_dir):
    out = {r["user_id"]: r for r in SPECS["s_stateful_totals"].fn(spark, sf_dir).collect()}
    batch = {
        r["user_id"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(out) == set(batch)
    for uid, r in out.items():
        assert r["n_events"] == batch[uid]["n"]
        assert abs(r["total_value"] - batch[uid]["total"]) < 1e-6


def test_salted_agg_equals_plain(spark, sf_dir):
    from bristle_spark.functions.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    salted = {
        (r["event_type"],): (r["count_event_id"], round(r["sum_value"], 6))
        for r in salted_agg(
            ev, ["event_type"], {"event_id": "count", "value": "sum"}, buckets=8
        ).collect()
    }
    plain = {
        (r["event_type"],): (r["n"], round(r["total"], 6))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    from bristle_spark.functions.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o.o_custkey == c.c_custkey).count()
    salted = salted_join(o, c, F.col("o_custkey"), F.col("c_custkey"), buckets=4).count()
    assert salted == plain


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The whole point of the salt: a single hot join key must scatter
    across (nearly) all salt buckets. The original implementation
    hashed the KEY for the salt — constant per key, zero skew relief
    (r8 fix); this pins the row-level salt."""
    from pyspark.sql import functions as F2

    hot = spark.range(10_000).select(
        F2.lit(42).alias("k"), F2.col("id").alias("payload")
    )
    salted = hot.withColumn("_salt", F2.pmod(F2.xxhash64(*hot.columns), F2.lit(8)))
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets >= 7  # 10k rows over 8 buckets: all (or near-all) hit


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    from bristle_spark.functions.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    try:
        salted_agg(ev, ["event_type"], {"value": "avg"})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "non-algebraic" in str(e)


# ------------------------------------------------ property-based roundtrip

token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=12
)


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), token),  # name
            st.one_of(st.none(), st.integers(0, 2)),  # enum code
            st.one_of(
                st.none(),
                st.tuples(st.integers(0, 2**31), st.integers(0, 999_999_999)),
            ),  # timestamp
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),  # value
            st.one_of(st.none(), st.dictionaries(token, token, max_size=3)),  # tags
            st.one_of(st.none(), st.lists(token, max_size=4)),  # labels
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_transcode_roundtrip_property(spark, rows):
    """Random ExampleMessage rows: encode -> decode -> transcode must
    implement the intended S1-S13 semantics exactly (unset -> NULL for
    nullable / [] for arrays / proto zero otherwise; sorted map arrays;
    µs-truncated UTC timestamps)."""
    import datetime

    from pyspark.sql import types as T

    from bristle_spark.ingest import pipeline
    from bristle_spark.ingest.fixtures import encode_example_row, example_binding

    binding = example_binding()
    bodies = [
        encode_example_row(
            name=n, type_code=tc, ts=ts, value=v, tags=tags or None, labels=labels or None
        )
        for (n, tc, ts, v, tags, labels) in rows
    ]
    payloads = spark.createDataFrame(
        [(binding.message_name, b) for b in bodies],
        schema=T.StructType(
            [T.StructField("type", T.StringType()), T.StructField("body", T.BinaryType())]
        ),
    )
    got = pipeline.ingest(payloads, binding).collect()
    assert len(got) == len(rows)
    got_sorted = sorted(
        ((r["name"], r["type"], r["timestamp"], r["value"], r["tags.key"], r["tags.value"], r["labels"]) for r in got),
        key=repr,
    )
    expected = [
        (
            n or "",
            tc or 0,
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(seconds=(ts[0] if ts else 0))
            + datetime.timedelta(microseconds=((ts[1] // 1000) if ts else 0)),
            v,  # Nullable(Int64): None stays None
            sorted((tags or {}).keys()),
            [x for _, x in sorted((tags or {}).items())],
            labels or [],
        )
        for (n, tc, ts, v, tags, labels) in rows
    ]
    expected.sort(key=repr)
    assert got_sorted == expected
