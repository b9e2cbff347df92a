"""INSERT-generation parity with the reference's cached query text
(reference clickhouse_table.go:87-111): position-ordered double-quoted
columns, bare-comma joins, one ``?`` per column, trailing semicolon."""

from __future__ import annotations

import pytest

from bristle_spark.ingest.bindings import SinkColumn
from bristle_spark.ingest.clickhouse import generate_insert_query, insert_column_names
from bristle_spark.ingest.fixtures import (
    binance_binding,
    example_binding,
    finnhub_binding,
)


def test_example_table_insert_query():
    assert generate_insert_query(example_binding()) == (
        "INSERT INTO default.example_table "
        '("name","type","timestamp","value","tags.key","tags.value","labels") '
        "VALUES (?,?,?,?,?,?,?);"
    )


def test_binance_insert_query():
    assert generate_insert_query(binance_binding()) == (
        "INSERT INTO binance.trade_events "
        '("event_type","event_time","symbol","trade_id","price","quantity",'
        '"buy_order_id","sell_order_id","trade_time","market_maker","m") '
        "VALUES (?,?,?,?,?,?,?,?,?,?,?);"
    )


def test_finnhub_insert_query():
    assert generate_insert_query(finnhub_binding()) == (
        "INSERT INTO finnhub.trades "
        '("symbol","price","trade_time","volume","trade_conditions") '
        "VALUES (?,?,?,?,?);"
    )


def test_column_names_follow_sink_positions_not_list_order():
    b = example_binding()
    # shuffle the declaration order; positions must still win
    b.sink_columns = list(reversed(b.sink_columns))
    assert insert_column_names(b) == [
        "name", "type", "timestamp", "value", "tags.key", "tags.value", "labels",
    ]


def test_duplicate_or_out_of_range_positions_rejected():
    b = finnhub_binding()
    b.sink_columns = b.sink_columns[:-1] + [
        SinkColumn("trade_conditions", 4, "Array(String)")
    ]
    with pytest.raises(ValueError, match="bad column positions"):
        generate_insert_query(b)


def test_write_sink_clickhouse_branch_requires_binding(spark):
    from bristle_spark.ingest.pipeline import write_sink

    df = spark.range(1)
    with pytest.raises(ValueError, match="requires the table binding"):
        write_sink(df, "/tmp/unused", clickhouse_url="jdbc:clickhouse://host:8123/db")
