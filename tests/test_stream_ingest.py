"""Streaming ingest end-to-end: file payload stream -> decode ->
transcode -> checkpointed parquet sink, with exactly-once restart
semantics (the durability the reference lacks — SURVEY.md §8.2)."""

from __future__ import annotations

from pyspark.sql import types as T

from bristle_spark.ingest import wire
from bristle_spark.ingest.fixtures import finnhub_binding
from bristle_spark.streaming.ingest_stream import run_stream_ingest

PAYLOAD_SCHEMA = T.StructType(
    [T.StructField("type", T.StringType()), T.StructField("body", T.BinaryType())]
)


def _write_payload_chunks(spark, payload_dir, binding, n_chunks=3, per_chunk=20):
    rows_total = 0
    for c in range(n_chunks):
        bodies = [
            wire.encode_message(
                [
                    (1, "string", f"SYM{c}_{i}", False),
                    (2, "double", float(c * 100 + i), False),
                    (3, "uint64", 1_700_000_000_000 + (c * per_chunk + i) * 1000, False),
                ]
            )
            for i in range(per_chunk)
        ]
        rows_total += len(bodies)
        spark.createDataFrame(
            [(binding.message_name, b) for b in bodies], schema=PAYLOAD_SCHEMA
        ).coalesce(1).write.mode("append").parquet(payload_dir)
    return rows_total


def test_stream_ingest_exactly_once(spark, tmp_path):
    binding = finnhub_binding()
    payload_dir = str(tmp_path / "payloads")
    sink_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    total = _write_payload_chunks(spark, payload_dir, binding)
    n1 = run_stream_ingest(
        spark, payload_dir, binding, sink_dir, ckpt, ts_column="trade_time"
    )
    assert n1 >= 1
    out = spark.read.parquet(sink_dir)
    assert out.count() == total
    assert "_day" in out.columns  # day-partitioned sink layout

    # restart with the same checkpoint: nothing new -> no duplicates
    run_stream_ingest(spark, payload_dir, binding, sink_dir, ckpt, ts_column="trade_time")
    assert spark.read.parquet(sink_dir).count() == total

    # new data arrives -> only the delta lands
    more = _write_payload_chunks(spark, payload_dir, binding, n_chunks=1)
    run_stream_ingest(spark, payload_dir, binding, sink_dir, ckpt, ts_column="trade_time")
    assert spark.read.parquet(sink_dir).count() == total + more


def test_stream_ingest_schema_matches_batch(spark, tmp_path):
    binding = finnhub_binding()
    payload_dir = str(tmp_path / "payloads")
    _write_payload_chunks(spark, payload_dir, binding, n_chunks=1, per_chunk=5)
    run_stream_ingest(
        spark, payload_dir, binding, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    out = spark.read.parquet(str(tmp_path / "sink"))
    expected = [c.name for c in sorted(binding.sink_columns, key=lambda c: c.position)]
    assert out.columns == expected
