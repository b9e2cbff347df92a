"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful operators (time enters only as a flush
ticker — SURVEY.md §2.C); this is the engine's extension point for the
ones a real pipeline needs: running per-key accumulators, custom
session logic, dedup-within-stream. The demo operator keeps per-user
running (event count, value total) state across micro-batches and
emits the updated totals each batch — state lives in the state store,
checkpointed with the query, so it survives restarts exactly-once.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        # deterministic accumulation: batches arrive in file order, rows
        # summed in event_id order within the batch
        for v in pdf.sort_values("event_id")["value"]:
            total += float(v)
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of events -> per-user running totals,
    emitted once per micro-batch per active user (update mode)."""
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
