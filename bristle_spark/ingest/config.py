"""Config-driven binding registry — the engine's analog of the
reference's JSON config + binding bootstrap (reference config.go:33-94,
message_binding_registry.go:18-70, loaded in server.go:51-126).

Config shape (JSON or dict):

    {
      "tables": [
        {
          "name": "binance.trade_events",
          "columns": [{"name": "event_type", "type": "LowCardinality(String)"}, ...],
          "messages": ["bristle.examples.binance.Trade"]
        }
      ],
      "messages": {
        "bristle.examples.binance.Trade": {
          "fields": [
            {"number": 1, "name": "eventType", "kind": "string",
             "column": "event_type", "json_name": "e"},
            ...
          ]
        }
      }
    }

Columns get positions from list order (the reference introspects
positions from system.columns, clickhouse_cluster.go:74-91). The
explicit per-table ``messages`` list mirrors the reference's explicit
binding mode; bindings validate eagerly and the first binding of a
table wins, as in the reference.
"""

from __future__ import annotations

import json
from typing import Any

from bristle_spark.ingest.bindings import (
    BindingRegistry,
    FieldSpec,
    MessageBinding,
    SinkColumn,
)


def _field_from_dict(d: dict[str, Any]) -> FieldSpec:
    return FieldSpec(
        number=int(d["number"]),
        name=d["name"],
        kind=d["kind"],
        repeated=bool(d.get("repeated", False)),
        column=d.get("column"),
        json_name=d.get("json_name"),
    )


def sink_columns_from_config(table_cfg: dict) -> list[SinkColumn]:
    """Table-config dict -> ordered SinkColumns (shared by the explicit
    registry path here and server.py's autobind path, so position and
    default semantics cannot drift between the two binding modes)."""
    return [
        SinkColumn(
            name=c["name"],
            position=int(c.get("position", i + 1)),
            ch_type=c["type"],
            default=c.get("default"),
        )
        for i, c in enumerate(table_cfg.get("columns", []))
    ]


def registry_from_config(config: dict[str, Any]) -> BindingRegistry:
    messages = config.get("messages", {})
    registry = BindingRegistry()
    for table in config.get("tables", []):
        sink_columns = sink_columns_from_config(table)
        for message_name in table.get("messages", []):
            spec = messages.get(message_name)
            if spec is None:
                raise ValueError(
                    f"table {table['name']!r} references unknown message "
                    f"{message_name!r}"
                )
            binding = MessageBinding(
                message_name=message_name,
                fields=[_field_from_dict(f) for f in spec.get("fields", [])],
                sink_table=table["name"],
                sink_columns=sink_columns,
            )
            registry.register(binding)
    return registry


def registry_from_json(path: str) -> BindingRegistry:
    with open(path) as fh:
        return registry_from_config(json.load(fh))
