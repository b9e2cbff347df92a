"""ClickHouse INSERT sink (D10), engine-side.

The reference caches one prepared INSERT per bound table and drives it
from the flush loop (reference clickhouse_table.go:87-111 builds the
query; clickhouse_table_writer.go:115-149 executes it batch-wise inside
a transaction). No ClickHouse server or driver exists in this
environment, so the engine keeps the two halves separate:

- ``generate_insert_query`` / ``insert_column_names`` reproduce the
  reference's cached query text and column order exactly (unit-tested
  against the three example bindings);
- ``write_jdbc`` is the live branch: a standard Spark JDBC batch write
  using that column order, taken when the caller supplies a JDBC URL
  and the driver jar is on the classpath. Each executor partition
  becomes one transaction of batched INSERTs — the same shape as the
  reference's writer goroutines, but horizontally scaled by Spark
  instead of a fixed pool (reference clickhouse_table.go:62-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bristle_spark.ingest.bindings import MessageBinding, SinkColumn


def _position_ordered(columns: list[SinkColumn]) -> list[SinkColumn]:
    """Columns in sink-table position order (reference
    clickhouse_table.go:90-95 fills by ``column.Position - 1``)."""
    out: list[SinkColumn | None] = [None] * len(columns)
    for c in columns:
        if not 1 <= c.position <= len(columns) or out[c.position - 1] is not None:
            raise ValueError(f"bad column positions: {[x.position for x in columns]}")
        out[c.position - 1] = c
    return [c for c in out if c is not None]


def insert_column_names(binding: MessageBinding) -> list[str]:
    """cachedColumnNames analog: unquoted names in position order."""
    return [c.name for c in _position_ordered(binding.sink_columns)]


def generate_insert_query(binding: MessageBinding) -> str:
    """The reference's cached INSERT text, byte-for-byte
    (clickhouse_table.go:102-108): double-quoted column names joined
    with bare commas, one ``?`` placeholder per column, trailing
    semicolon."""
    names = insert_column_names(binding)
    enclosed = ",".join(f'"{n}"' for n in names)
    placeholders = ",".join("?" for _ in names)
    return f"INSERT INTO {binding.sink_table} ({enclosed}) VALUES ({placeholders});"


def write_jdbc(
    df: DataFrame,
    binding: MessageBinding,
    url: str,
    batch_size: int = 100_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Live ClickHouse branch: batched JDBC INSERTs in the reference's
    column order. ``batch_size`` defaults to the reference's
    MaxBatchSize (config.go:88). Requires a ClickHouse JDBC driver on
    the Spark classpath — absent in this sandbox, so this branch is
    exercised only by the query-text unit tests."""
    out = df.select(*insert_column_names(binding))
    if num_partitions is not None:
        out = out.repartition(num_partitions)
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", binding.sink_table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "READ_COMMITTED")
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
