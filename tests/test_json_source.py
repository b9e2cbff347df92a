"""D16 JSON-lines path: parses protojson-style lines (json_name aliases)
and produces exactly the same sink rows as the wire-format path."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from bristle_spark.ingest import json_source, pipeline, wire
from bristle_spark.ingest.bindings import FieldSpec, MessageBinding, SinkColumn
from bristle_spark.ingest.fixtures import binance_binding

LINES_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def _binance_json_binding() -> MessageBinding:
    """binance binding with the proto json_name aliases
    (reference examples/binance.proto:6-18: e/E/s/t/p/q/b/a/T/m/M)."""
    b = binance_binding()
    aliases = {
        "eventType": "e", "eventTime": "E", "symbol": "s", "tradeID": "t",
        "price": "p", "quantity": "q", "buyOrderID": "b", "sellOrderID": "a",
        "tradeTime": "T", "marketMaker": "m", "M": "M",
    }
    fields = [
        FieldSpec(f.number, f.name, f.kind, f.repeated, f.column, aliases[f.name])
        for f in b.fields
    ]
    return MessageBinding(b.message_name, fields, b.sink_table, b.sink_columns)


TRADES = [
    {"e": "trade", "E": 1_700_000_000_123, "s": "BTCUSDT", "t": 11,
     "p": 42123.45678901, "q": 0.25, "b": 77, "a": 88, "T": 1_700_000_000_456,
     "m": True, "M": False},
    {"e": "trade", "E": 1_700_000_060_000, "s": "ETHUSDT", "t": 12,
     "p": 2222.5, "q": 1.0, "b": 79, "a": 90, "T": 1_700_000_060_001,
     "m": False, "M": True},
]


def test_json_path_equals_wire_path(spark):
    binding = _binance_json_binding()
    lines = spark.createDataFrame(
        [(json.dumps(t),) for t in TRADES], schema=LINES_SCHEMA
    )
    via_json = json_source.ingest_json_lines(lines, binding).orderBy("trade_id").collect()

    kinds = {f.name: (f.kind, f.repeated) for f in binding.fields}
    alias_to_name = {f.json_key: f.name for f in binding.fields}
    bodies = []
    for t in TRADES:
        fields = []
        for key, value in t.items():
            name = alias_to_name[key]
            spec = next(f for f in binding.fields if f.name == name)
            fields.append((spec.number, spec.kind, value, spec.repeated))
        bodies.append(wire.encode_message(fields))
    payloads = spark.createDataFrame(
        [(binding.message_name, b) for b in bodies],
        schema=T.StructType(
            [T.StructField("type", T.StringType()), T.StructField("body", T.BinaryType())]
        ),
    )
    via_wire = pipeline.ingest(payloads, binding).orderBy("trade_id").collect()
    assert via_json == via_wire


def test_json_unparseable_line_filtered(spark):
    binding = _binance_json_binding()
    lines = spark.createDataFrame(
        [(json.dumps(TRADES[0]),), ("{not json",)], schema=LINES_SCHEMA
    )
    decoded = json_source.parse_json_lines(lines, binding)
    assert decoded.filter("NOT parsed_ok").count() == 1
    assert json_source.ingest_json_lines(lines, binding).count() == 1


def test_json_timestamp_message_normalization(spark):
    """protojson RFC-3339 Timestamp -> {seconds,nanos} -> DateTime."""
    binding = MessageBinding(
        message_name="m",
        sink_table="t",
        fields=[
            FieldSpec(1, "name", "string"),
            FieldSpec(2, "when", "timestamp"),
        ],
        sink_columns=[
            SinkColumn("name", 1, "String"),
            SinkColumn("when", 2, "DateTime"),
        ],
    )
    lines = spark.createDataFrame(
        [('{"name": "x", "when": "2023-11-14T22:13:20.5Z"}',)], schema=LINES_SCHEMA
    )
    row = json_source.ingest_json_lines(lines, binding).collect()[0]
    import datetime

    assert row["when"] == datetime.datetime(2023, 11, 14, 22, 13, 20, 500000)


def test_config_registry_roundtrip(tmp_path):
    import json as _json

    from bristle_spark.ingest.config import registry_from_json

    config = {
        "tables": [
            {
                "name": "finnhub.trades",
                "columns": [
                    {"name": "symbol", "type": "LowCardinality(String)"},
                    {"name": "price", "type": "Float64"},
                    {"name": "trade_conditions", "type": "Array(String)", "default": "[]"},
                ],
                "messages": ["fh.Trade"],
            }
        ],
        "messages": {
            "fh.Trade": {
                "fields": [
                    {"number": 1, "name": "symbol", "kind": "string"},
                    {"number": 2, "name": "price", "kind": "double"},
                    {"number": 5, "name": "tradeConditions", "kind": "string",
                     "repeated": True, "column": "trade_conditions", "json_name": "c"},
                ]
            }
        },
    }
    p = tmp_path / "config.json"
    p.write_text(_json.dumps(config))
    reg = registry_from_json(str(p))
    binding = reg.for_type("fh.Trade")
    assert binding.sink_table == "finnhub.trades"
    assert binding.sink_columns[2].position == 3
    assert binding.fields[2].json_key == "c"


def test_config_unknown_message_rejected():
    from bristle_spark.ingest.config import registry_from_config

    try:
        registry_from_config(
            {"tables": [{"name": "t", "columns": [], "messages": ["missing.Msg"]}]}
        )
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "unknown message" in str(e)
