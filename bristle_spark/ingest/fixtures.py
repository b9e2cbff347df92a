"""The reference's three example proto<->DDL fixtures as bindings
(FIXTURES.md §A; reference examples/{example,binance,finnhub}.{proto,sql}).
These are the only correctness artifacts the reference ships (it has no
tests — SURVEY.md §5), so they drive the ingest-path round-trip tests.
"""

from __future__ import annotations

from bristle_spark.ingest.bindings import FieldSpec, MessageBinding, SinkColumn

# enum MessageType {EMPTY=0, SMALL=1, BIG=2} (examples/example.proto:8-12)
EXAMPLE_ENUM = (("empty", 0), ("small", 1), ("big", 2))


def example_binding() -> MessageBinding:
    """ExampleMessage -> default.example_table
    (examples/example.proto:6-21, examples/example.sql:1-11)."""
    return MessageBinding(
        message_name="bristle.examples.ExampleMessage",
        sink_table="default.example_table",
        fields=[
            FieldSpec(1, "name", "string"),
            FieldSpec(2, "type", "enum"),
            FieldSpec(3, "timestamp", "timestamp"),
            FieldSpec(4, "value", "int64"),
            FieldSpec(5, "tags", "map:string:string"),
            FieldSpec(6, "labels", "string", repeated=True),
        ],
        sink_columns=[
            SinkColumn("name", 1, "String"),
            SinkColumn("type", 2, "Enum8('empty'=0,'small'=1,'big'=2)"),
            SinkColumn("timestamp", 3, "DateTime"),
            SinkColumn("value", 4, "Nullable(Int64)"),
            SinkColumn("tags.key", 5, "Array(String)"),
            SinkColumn("tags.value", 6, "Array(String)"),
            SinkColumn("labels", 7, "Array(String)", default="[]"),
        ],
    )


def binance_binding() -> MessageBinding:
    """Trade -> binance.trade_events
    (examples/binance.proto:5-19, examples/binance.sql:1-16). Field
    renames exercise the bristle_column path (S12)."""
    return MessageBinding(
        message_name="bristle.examples.binance.Trade",
        sink_table="binance.trade_events",
        fields=[
            FieldSpec(1, "eventType", "string", column="event_type"),
            FieldSpec(2, "eventTime", "uint64", column="event_time"),
            FieldSpec(3, "symbol", "string"),
            FieldSpec(4, "tradeID", "uint64", column="trade_id"),
            FieldSpec(5, "price", "double"),
            FieldSpec(6, "quantity", "double"),
            FieldSpec(7, "buyOrderID", "uint64", column="buy_order_id"),
            FieldSpec(8, "sellOrderID", "uint64", column="sell_order_id"),
            FieldSpec(9, "tradeTime", "uint64", column="trade_time"),
            FieldSpec(10, "marketMaker", "bool", column="market_maker"),
            FieldSpec(11, "M", "bool", column="m"),
        ],
        sink_columns=[
            SinkColumn("event_type", 1, "LowCardinality(String)"),
            SinkColumn("event_time", 2, "DateTime64(3)"),
            SinkColumn("symbol", 3, "LowCardinality(String)"),
            SinkColumn("trade_id", 4, "UInt64"),
            SinkColumn("price", 5, "Decimal(38, 8)"),
            SinkColumn("quantity", 6, "Decimal(38, 8)"),
            SinkColumn("buy_order_id", 7, "UInt64"),
            SinkColumn("sell_order_id", 8, "UInt64"),
            SinkColumn("trade_time", 9, "DateTime64(3)"),
            SinkColumn("market_maker", 10, "Nullable(UInt8)"),
            SinkColumn("m", 11, "UInt8"),
        ],
    )


def finnhub_binding() -> MessageBinding:
    """FinnhubTrade -> finnhub.trades
    (examples/finnhub.proto:5-13, examples/finnhub.sql:1-10)."""
    return MessageBinding(
        message_name="bristle.examples.finnhub.FinnhubTrade",
        sink_table="finnhub.trades",
        fields=[
            FieldSpec(1, "symbol", "string"),
            FieldSpec(2, "price", "double"),
            FieldSpec(3, "tradeTime", "uint64", column="trade_time"),
            FieldSpec(4, "volume", "double"),
            FieldSpec(5, "tradeConditions", "string", repeated=True, column="trade_conditions"),
        ],
        sink_columns=[
            SinkColumn("symbol", 1, "LowCardinality(String)"),
            SinkColumn("price", 2, "Float64"),
            SinkColumn("trade_time", 3, "DateTime64(3)"),
            SinkColumn("volume", 4, "Float64"),
            SinkColumn("trade_conditions", 5, "Array(String)", default="[]"),
        ],
    )


def encode_example_row(
    name: str | None = None,
    type_code: int | None = None,
    ts: tuple[int, int] | None = None,
    value: int | None = None,
    tags: dict[str, str] | None = None,
    labels: list[str] | None = None,
) -> bytes:
    from bristle_spark.ingest import wire

    return wire.encode_message(
        [
            (1, "string", name, False),
            (2, "enum", type_code, False),
            (3, "timestamp", ts, False),
            (4, "int64", value, False),
            (5, "map:string:string", tags, False),
            (6, "string", labels, True),
        ]
    )


# --------------------------------------------------------------------------
# Compiled descriptor-set fixtures: the bytes `protoc --descriptor_set_out`
# would emit for the three example protos (reference examples/*.proto),
# built with the wire codec. These drive the descriptors.py autobind tests
# (reference proto_registry.go:45-103, message_binding_registry.go:38-70).

def _field_descriptor(
    name: str,
    number: int,
    type_code: int,
    label: int = 1,
    type_name: str | None = None,
    json_name: str | None = None,
    column: str | None = None,
    ch_type: str | None = None,
) -> bytes:
    from bristle_spark.ingest import wire

    options = (
        wire.encode_message(
            [(50001, "string", column, False), (50002, "string", ch_type, False)]
        )
        if column is not None or ch_type is not None
        else None
    )
    return wire.encode_message(
        [
            (1, "string", name, False),
            (3, "int32", number, False),
            (4, "enum", label, False),
            (5, "enum", type_code, False),
            (6, "string", type_name, False),
            (8, "bytes", options, False),
            (10, "string", json_name, False),
        ]
    )


def _message_descriptor(
    name: str,
    fields: list[bytes],
    nested: list[bytes] | None = None,
    table: str | None = None,
    map_entry: bool = False,
) -> bytes:
    from bristle_spark.ingest import wire

    options = (
        wire.encode_message(
            [(7, "bool", map_entry or None, False), (50001, "string", table, False)]
        )
        if table is not None or map_entry
        else None
    )
    return wire.encode_message(
        [
            (1, "string", name, False),
            (2, "bytes", fields, True),
            (3, "bytes", nested or None, True),
            (7, "bytes", options, False),
        ]
    )


def _file_descriptor_set(
    filename: str, messages: list[bytes], package: str | None = None
) -> bytes:
    from bristle_spark.ingest import wire

    file_proto = wire.encode_message(
        [
            (1, "string", filename, False),
            (2, "string", package, False),
            (4, "bytes", messages, True),
        ]
    )
    return wire.encode_message([(1, "bytes", [file_proto], True)])


# FieldDescriptorProto.Type codes used below (public descriptor.proto)
_T_DOUBLE, _T_UINT64, _T_BOOL, _T_STRING, _T_MESSAGE, _T_ENUM, _T_INT64 = (
    1, 4, 8, 9, 11, 14, 3,
)
_REPEATED = 3


def example_descriptor_set() -> bytes:
    """examples/example.proto compiled: ExampleMessage with the
    bristle_table option, a Timestamp field, a map field (nested
    TagsEntry, map_entry=true) and a repeated string."""
    tags_entry = _message_descriptor(
        "TagsEntry",
        [
            _field_descriptor("key", 1, _T_STRING),
            _field_descriptor("value", 2, _T_STRING),
        ],
        map_entry=True,
    )
    msg = _message_descriptor(
        "ExampleMessage",
        [
            _field_descriptor("name", 1, _T_STRING),
            _field_descriptor("type", 2, _T_ENUM, type_name=".MessageType"),
            _field_descriptor(
                "timestamp", 3, _T_MESSAGE, type_name=".google.protobuf.Timestamp"
            ),
            _field_descriptor("value", 4, _T_INT64),
            _field_descriptor(
                "tags", 5, _T_MESSAGE, label=_REPEATED,
                type_name=".ExampleMessage.TagsEntry",
            ),
            _field_descriptor("labels", 6, _T_STRING, label=_REPEATED),
        ],
        nested=[tags_entry],
        table="default.example_table",
    )
    return _file_descriptor_set("example.proto", [msg])


def binance_descriptor_set() -> bytes:
    """examples/binance.proto compiled: single-letter json_name aliases
    (the protojson wire names), no package, camelCase columns."""
    jn = [
        ("eventType", 1, _T_STRING, "e"),
        ("eventTime", 2, _T_UINT64, "E"),
        ("symbol", 3, _T_STRING, "s"),
        ("tradeID", 4, _T_UINT64, "t"),
        ("price", 5, _T_DOUBLE, "p"),
        ("quantity", 6, _T_DOUBLE, "q"),
        ("buyOrderID", 7, _T_UINT64, "b"),
        ("sellOrderID", 8, _T_UINT64, "a"),
        ("tradeTime", 9, _T_UINT64, "T"),
        ("marketMaker", 10, _T_BOOL, "m"),
        ("M", 11, _T_BOOL, "M"),
    ]
    msg = _message_descriptor(
        "Trade",
        [_field_descriptor(n, num, t, json_name=j) for n, num, t, j in jn],
        table="binance.trade_events",
    )
    return _file_descriptor_set("binance.proto", [msg])


def finnhub_descriptor_set() -> bytes:
    """examples/finnhub.proto compiled."""
    msg = _message_descriptor(
        "FinnhubTrade",
        [
            _field_descriptor("symbol", 1, _T_STRING, json_name="s"),
            _field_descriptor("price", 2, _T_DOUBLE, json_name="p"),
            _field_descriptor("tradeTime", 3, _T_UINT64, json_name="t"),
            _field_descriptor("volume", 4, _T_DOUBLE, json_name="v"),
            _field_descriptor(
                "tradeConditions", 5, _T_STRING, label=_REPEATED, json_name="c"
            ),
        ],
        table="finnhub.trades",
    )
    return _file_descriptor_set("finnhub.proto", [msg])


def binance_ddl_columns() -> list[SinkColumn]:
    """binance.trade_events exactly as examples/binance.sql declares it
    (camelCase names — the proto binds by field name, no renames)."""
    return [
        SinkColumn("eventType", 1, "LowCardinality(String)"),
        SinkColumn("eventTime", 2, "DateTime64(3)"),
        SinkColumn("symbol", 3, "LowCardinality(String)"),
        SinkColumn("tradeID", 4, "UInt64"),
        SinkColumn("price", 5, "Decimal(38, 8)"),
        SinkColumn("quantity", 6, "Decimal(38, 8)"),
        SinkColumn("buyOrderID", 7, "UInt64"),
        SinkColumn("sellOrderID", 8, "UInt64"),
        SinkColumn("tradeTime", 9, "DateTime64(3)"),
        SinkColumn("marketMaker", 10, "Nullable(UInt8)"),
        SinkColumn("M", 11, "UInt8"),
    ]


def finnhub_ddl_columns() -> list[SinkColumn]:
    """finnhub.trades exactly as examples/finnhub.sql declares it."""
    return [
        SinkColumn("symbol", 1, "LowCardinality(String)"),
        SinkColumn("price", 2, "Float64"),
        SinkColumn("tradeTime", 3, "DateTime64(3)"),
        SinkColumn("volume", 4, "Float64"),
        SinkColumn("tradeConditions", 5, "Array(String)", default="[]"),
    ]
