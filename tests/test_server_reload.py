"""Hot-reload server analog (D17; reference server.go:51-126): full
state rebuild on reload, old-state-preserved on error, writer-group
swap with exactly-once handoff across generations."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from bristle_spark.ingest.fixtures import (
    encode_example_row,
    example_binding,
    example_descriptor_set,
)
from bristle_spark.ingest.server import IngestServer

PAYLOAD_SCHEMA = T.StructType(
    [T.StructField("type", T.StringType()), T.StructField("body", T.BinaryType())]
)


def _explicit_config() -> dict:
    b = example_binding()
    return {
        "tables": [
            {
                "name": b.sink_table,
                "columns": [
                    {"name": c.name, "type": c.ch_type, "default": c.default}
                    for c in b.sink_columns
                ],
                "messages": [b.message_name],
            }
        ],
        "messages": {
            b.message_name: {
                "fields": [
                    {
                        "number": f.number,
                        "name": f.name,
                        "kind": f.kind,
                        "repeated": f.repeated,
                        "column": f.column,
                        "json_name": f.json_name,
                    }
                    for f in b.fields
                ]
            }
        },
    }


def _autobind_config(pb_path: str) -> dict:
    b = example_binding()
    return {
        "autobind": True,
        "proto_descriptor_paths": [pb_path],
        "tables": [
            {
                "name": b.sink_table,
                "columns": [
                    {"name": c.name, "type": c.ch_type, "default": c.default}
                    for c in b.sink_columns
                ],
            }
        ],
    }


def _write_payload(spark, server, message_name: str, rows: list[bytes], tag: str):
    safe = "default__example_table"
    payload_dir = os.path.join(server.data_root, "payloads", safe)
    df = spark.createDataFrame(
        [(message_name, bytearray(r)) for r in rows], schema=PAYLOAD_SCHEMA
    )
    df.coalesce(1).write.mode("append").parquet(payload_dir)


def _bodies(start: int, n: int) -> list[bytes]:
    return [
        encode_example_row(
            name=f"doc{i}", type_code=1, ts=(1_700_000_000 + i, 0), value=i
        )
        for i in range(start, start + n)
    ]


def test_server_pump_reload_and_exactly_once_handoff(spark, tmp_path):
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_explicit_config()))
    server = IngestServer(spark, str(cfg_path), str(tmp_path / "data"))

    b = example_binding()
    _write_payload(spark, server, b.message_name, _bodies(0, 10), "gen1")
    assert server.pump()[b.sink_table] >= 1
    sink = os.path.join(server.data_root, "sink", "default__example_table")
    assert spark.read.parquet(sink).count() == 10

    # reload into descriptor-set autobind mode (message name changes to
    # the descriptor's full name, table stays the same)
    pb_path = tmp_path / "example.pb"
    pb_path.write_bytes(example_descriptor_set())
    cfg_path.write_text(json.dumps(_autobind_config(str(pb_path))))
    assert server.reload() is True
    assert server.registry.for_type("ExampleMessage").sink_table == b.sink_table

    # second generation payloads decode under the autobound binding;
    # the checkpoint carried over, so generation-1 files are not replayed
    _write_payload(spark, server, "ExampleMessage", _bodies(10, 5), "gen2")
    server.pump()
    out = spark.read.parquet(sink)
    assert out.count() == 15  # exactly-once across the swap
    assert out.select("name").distinct().count() == 15


def test_reload_error_keeps_old_state(spark, tmp_path):
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_explicit_config()))
    server = IngestServer(spark, str(cfg_path), str(tmp_path / "data"))
    old_registry = server.registry

    cfg_path.write_text("{ not json")
    assert server.reload() is False
    assert server.registry is old_registry

    # structurally valid JSON, semantically broken (unknown message ref)
    bad = _explicit_config()
    bad["tables"][0]["messages"] = ["no.such.Message"]
    cfg_path.write_text(json.dumps(bad))
    assert server.reload() is False
    assert server.registry is old_registry


def test_reload_drain_failure_restores_old_state(spark, tmp_path):
    """ADVICE r5: if the OLD writer group's drain throws after the swap,
    reload() must report False with the old state actually serving —
    not the new state silently live."""
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_explicit_config()))
    server = IngestServer(spark, str(cfg_path), str(tmp_path / "data"))
    old_registry, old_group, old_config = (
        server.registry,
        server.writer_group,
        server.config,
    )

    def boom(_spark):
        raise RuntimeError("drain failed")

    old_group.close = boom
    pb_path = tmp_path / "example.pb"
    pb_path.write_bytes(example_descriptor_set())
    cfg_path.write_text(json.dumps(_autobind_config(str(pb_path))))
    assert server.reload() is False
    assert server.registry is old_registry
    assert server.writer_group is old_group
    assert server.config is old_config


def test_reload_refuses_sink_schema_change(spark, tmp_path):
    """ADVICE r5: sink dirs survive reloads; a reload that rebinds a
    table to a different column set must be refused (else later reads
    silently resolve one footer's schema)."""
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_explicit_config()))
    server = IngestServer(spark, str(cfg_path), str(tmp_path / "data"))
    old_registry = server.registry

    b = example_binding()
    _write_payload(spark, server, b.message_name, _bodies(0, 5), "gen1")
    server.pump()

    renamed = _explicit_config()
    for c in renamed["tables"][0]["columns"]:
        if c["name"] == "value":
            c["name"] = "value_renamed"
    for f in renamed["messages"][b.message_name]["fields"]:
        if (f["column"] or f["name"]) == "value":
            f["column"] = "value_renamed"
    cfg_path.write_text(json.dumps(renamed))
    assert server.reload() is False
    assert server.registry is old_registry

    # the same rebinding against an EMPTY sink is fine
    server2 = IngestServer(spark, str(cfg_path), str(tmp_path / "data2"))
    assert server2.registry is not None


def test_relative_descriptor_paths_resolve_against_config_dir(spark, tmp_path):
    """ADVICE r5: `serve --config some/dir/cfg.json` must work from any
    CWD — relative proto_descriptor_paths are config-file-relative."""
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "example.pb").write_bytes(example_descriptor_set())
    cfg = _autobind_config("example.pb")  # relative to the config file
    (sub / "config.json").write_text(json.dumps(cfg))
    server = IngestServer(spark, str(sub / "config.json"), str(tmp_path / "data"))
    assert server.registry.for_type("ExampleMessage") is not None


def test_server_init_fails_hard_on_bad_config(spark, tmp_path):
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text("{ not json")
    with pytest.raises(Exception):
        IngestServer(spark, str(cfg_path), str(tmp_path / "data"))
