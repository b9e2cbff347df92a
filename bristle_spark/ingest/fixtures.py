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
