"""Descriptor-set (.pb) parsing + bristle_table autobind (SURVEY P4;
reference proto_registry.go:45-103, message_binding_registry.go:38-70,
bristle.proto:8-12). The fixtures are the bytes protoc would emit for
the three reference example protos, built with the repo's wire codec."""

from __future__ import annotations

import os

import pytest

from bristle_spark.ingest import wire
from bristle_spark.ingest.bindings import SinkColumn
from bristle_spark.ingest.descriptors import (
    DescriptorPool,
    autobind,
    parse_full_table_name,
    registry_from_descriptor_set,
)
from bristle_spark.ingest.fixtures import (
    _field_descriptor,
    _file_descriptor_set,
    _message_descriptor,
    binance_ddl_columns,
    binance_descriptor_set,
    encode_example_row,
    example_binding,
    example_descriptor_set,
    finnhub_ddl_columns,
    finnhub_descriptor_set,
)


def _example_tables():
    return {"default.example_table": example_binding().sink_columns}


def test_example_autobind_matches_handwritten_binding():
    reg = registry_from_descriptor_set(example_descriptor_set(), _example_tables())
    b = reg.for_type("ExampleMessage")
    assert b.sink_table == "default.example_table"
    ref = example_binding()
    assert [(f.number, f.name, f.kind, f.repeated) for f in b.fields] == [
        (f.number, f.name, f.kind, f.repeated) for f in ref.fields
    ]
    assert b.sink_columns == ref.sink_columns


def test_binance_autobind_binds_camelcase_ddl_with_json_names():
    reg = registry_from_descriptor_set(
        binance_descriptor_set(), {"binance.trade_events": binance_ddl_columns()}
    )
    b = reg.for_type("Trade")
    assert len(b.fields) == 11
    # no bristle_column renames in the reference proto: field name = column
    assert [f.column_name for f in b.fields] == [c.name for c in b.sink_columns]
    # protojson single-letter aliases survive (examples/binance.proto:8-18)
    assert [f.json_key for f in b.fields] == [
        "e", "E", "s", "t", "p", "q", "b", "a", "T", "m", "M",
    ]


def test_finnhub_autobind_repeated_string():
    reg = registry_from_descriptor_set(
        finnhub_descriptor_set(), {"finnhub.trades": finnhub_ddl_columns()}
    )
    b = reg.for_type("FinnhubTrade")
    conditions = b.fields[-1]
    assert conditions.name == "tradeConditions" and conditions.repeated
    assert conditions.kind == "string"


def test_autobind_reads_bristle_column_and_type_options():
    msg = _message_descriptor(
        "Renamed",
        [_field_descriptor("origName", 1, 9, column="renamed_col", ch_type="String")],
        table="db.renamed",
    )
    fds = _file_descriptor_set("renamed.proto", [msg])
    pool = DescriptorPool()
    pool.add_descriptor_set(fds)
    desc = pool.messages["Renamed"]
    assert desc.fields[0].column == "renamed_col"
    assert desc.fields[0].ch_type == "String"
    reg = autobind(pool, {"db.renamed": [SinkColumn("renamed_col", 1, "String")]})
    assert reg.for_type("Renamed").fields[0].column_name == "renamed_col"


def test_autobind_skips_messages_without_table_option():
    msg = _message_descriptor("Plain", [_field_descriptor("x", 1, 9)])
    fds = _file_descriptor_set("plain.proto", [msg])
    pool = DescriptorPool()
    pool.add_descriptor_set(fds)
    reg = autobind(pool, {})
    with pytest.raises(KeyError):
        reg.for_type("Plain")


def test_autobind_missing_table_is_hard_error():
    pool = DescriptorPool()
    pool.add_descriptor_set(example_descriptor_set())
    with pytest.raises(ValueError, match="failed to find table"):
        autobind(pool, {})


def test_first_table_binding_wins():
    """message_binding_registry.go:52-63: re-binding an already-bound
    table is a no-op (first wins)."""
    m1 = _message_descriptor("First", [_field_descriptor("x", 1, 9)], table="db.t")
    m2 = _message_descriptor("Second", [_field_descriptor("y", 1, 9)], table="db.t")
    fds = _file_descriptor_set("two.proto", [m1, m2])
    cols = {"db.t": [SinkColumn("x", 1, "String"), SinkColumn("y", 2, "String")]}
    reg = registry_from_descriptor_set(fds, cols)
    assert reg.for_type("First").message_name == "First"
    with pytest.raises(KeyError):
        reg.for_type("Second")


def test_arbitrary_embedded_message_rejected():
    """clickhouse_table.go:216-226: only google.protobuf.Timestamp may
    be embedded."""
    inner = _message_descriptor("Inner", [_field_descriptor("v", 1, 9)])
    outer = _message_descriptor(
        "Outer",
        [_field_descriptor("child", 1, 11, type_name=".Inner")],
        table="db.outer",
    )
    fds = _file_descriptor_set("bad.proto", [inner, outer])
    with pytest.raises(ValueError, match="arbitrary embedded message"):
        registry_from_descriptor_set(
            fds, {"db.outer": [SinkColumn("child", 1, "String")]}
        )


def test_parse_full_table_name():
    assert parse_full_table_name("db.table") == "db.table"
    with pytest.raises(ValueError, match="wrong number of seperators"):
        parse_full_table_name("no_database")


def test_add_path_walks_pb_directory(tmp_path):
    """proto_registry.go RegisterPath: a directory registers every *.pb
    under it; non-.pb files are ignored."""
    (tmp_path / "sub").mkdir()
    (tmp_path / "example.pb").write_bytes(example_descriptor_set())
    (tmp_path / "sub" / "finnhub.pb").write_bytes(finnhub_descriptor_set())
    (tmp_path / "notes.txt").write_text("ignored")
    pool = DescriptorPool()
    pool.add_path(str(tmp_path))
    assert {"ExampleMessage", "ExampleMessage.TagsEntry", "FinnhubTrade"} <= set(
        pool.messages
    )


def test_autobound_binding_decodes_end_to_end(spark):
    """The autobound ExampleMessage binding must drive the full
    decode+transcode pipeline identically to the handwritten one."""
    from pyspark.sql import types as T

    from bristle_spark.ingest import pipeline

    reg = registry_from_descriptor_set(example_descriptor_set(), _example_tables())
    binding = reg.for_type("ExampleMessage")
    body = encode_example_row(
        name="doc1",
        type_code=2,
        ts=(1_700_000_000, 500_000_000),
        value=42,
        tags={"a": "1", "b": "2"},
        labels=["x", "y"],
    )
    payloads = spark.createDataFrame(
        [("ExampleMessage", bytearray(body))],
        schema=T.StructType(
            [T.StructField("type", T.StringType()), T.StructField("body", T.BinaryType())]
        ),
    )
    row = pipeline.ingest(payloads, binding).collect()[0]
    assert row["name"] == "doc1"
    assert row["value"] == 42
    assert sorted(zip(row["tags.key"], row["tags.value"])) == [("a", "1"), ("b", "2")]
    assert list(row["labels"]) == ["x", "y"]


# ------------------------------------------------- property round-trip

from hypothesis import given, settings
from hypothesis import strategies as st

_SCALAR_TYPES = sorted([1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 14, 15, 16, 17, 18])
_IDENT = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12)

_field_strategy = st.builds(
    dict,
    name=_IDENT,
    type_code=st.sampled_from(_SCALAR_TYPES),
    repeated=st.booleans(),
    json_name=st.one_of(st.none(), _IDENT),
    column=st.one_of(st.none(), _IDENT),
)


@settings(max_examples=50, deadline=None)
@given(
    msg_name=_IDENT,
    package=st.one_of(st.none(), _IDENT),
    table=st.one_of(st.none(), _IDENT.map(lambda s: f"db.{s}")),
    fields=st.lists(_field_strategy, min_size=0, max_size=8),
)
def test_descriptor_roundtrip_property(msg_name, package, table, fields):
    """Any scalar-field message encoded as a descriptor set parses back
    with identical names, numbers, labels, type codes, and options."""
    fds_bytes = _file_descriptor_set(
        "gen.proto",
        [
            _message_descriptor(
                msg_name.capitalize(),
                [
                    _field_descriptor(
                        f["name"],
                        i + 1,
                        f["type_code"],
                        label=3 if f["repeated"] else 1,
                        json_name=f["json_name"],
                        column=f["column"],
                    )
                    for i, f in enumerate(fields)
                ],
                table=table,
            )
        ],
        package=package,
    )
    pool = DescriptorPool()
    pool.add_descriptor_set(fds_bytes)
    full = (f"{package}." if package else "") + msg_name.capitalize()
    desc = pool.messages[full]
    assert desc.bristle_table == table
    assert [
        (f.name, f.number, f.repeated, f.type_code, f.json_name, f.column)
        for f in desc.fields
    ] == [
        (f["name"], i + 1, f["repeated"], f["type_code"], f["json_name"], f["column"])
        for i, f in enumerate(fields)
    ]
