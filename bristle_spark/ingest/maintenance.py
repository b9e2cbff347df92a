"""Sink maintenance: the Spark-side analog of MergeTree background
merges.

The reference writes batches into ClickHouse MergeTree tables and leans
on the engine's background part merges to keep read amplification down —
its whole batching design exists "to not overwhelm ClickHouse with
merges" (reference README.md:6, clickhouse_table_writer.go:91-113;
examples/binance.sql:14-16 declares the MergeTree layout). Our D10 sink
is day-partitioned sorted parquet (pipeline.write_sink), and every
streaming micro-batch appends one small file per partition — the exact
small-parts problem MergeTree merges solve. ``compact_sink`` is that
merge: per day-partition with more than ``min_files`` parts, rewrite the
partition as few files re-sorted by the table's ORDER BY key.

100 TB shape: file-count stats come from a filesystem listing (no data
read); only offending partitions are scanned (partition pruning on
``_day``), each is rewritten by its own task(s), and the swap uses
dynamic partition overwrite so untouched days are never rewritten —
exactly how a production lakehouse OPTIMIZE schedules itself per
partition.
"""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_ROWS_PER_FILE = 10_000_000


def partition_file_stats(path: str) -> dict[str, int]:
    """day value -> parquet part-file count, from a pure fs listing."""
    stats: dict[str, int] = {}
    if not os.path.isdir(path):
        return stats
    for entry in os.listdir(path):
        if not entry.startswith("_day="):
            continue
        day = entry.split("=", 1)[1]
        pdir = os.path.join(path, entry)
        stats[day] = sum(
            1 for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
    return stats


def compact_sink(
    spark: SparkSession,
    path: str,
    order_by: list[str] | None = None,
    min_files: int = 2,
    max_rows_per_file: int = DEFAULT_MAX_ROWS_PER_FILE,
) -> dict:
    """Merge small parts in every day partition holding more than
    ``min_files`` files; returns accounting. Rows are re-sorted by
    ``order_by`` inside each output file (the MergeTree ORDER BY
    invariant write_sink established, restored after N append batches
    interleaved their key ranges)."""
    stats = partition_file_stats(path)
    days = sorted(d for d, c in stats.items() if c > min_files)
    if not days:
        return {"compacted_partitions": 0, "files_before": 0, "files_after": 0}
    files_before = sum(stats[d] for d in days)

    df: DataFrame = spark.read.parquet(path).filter(F.col("_day").isin(days))
    n_rows = df.count()
    # one partition (= merge task) per day — the day is the unit of
    # compaction work, like a MergeTree partition's part merge; the
    # row-size cap is enforced by the WRITER (maxRecordsPerFile rolls a
    # new sorted file at the cap), not by splitting the sort
    writer = df.repartition(len(days), F.col("_day"))
    if order_by:
        writer = writer.sortWithinPartitions("_day", *order_by)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer.write.mode("overwrite").option(
            "maxRecordsPerFile", max_rows_per_file
        ).partitionBy("_day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = partition_file_stats(path)
    return {
        "compacted_partitions": len(days),
        "files_before": files_before,
        "files_after": sum(after[d] for d in days),
        "rows": n_rows,
    }


def ttl_sweep(path: str, keep_days: int, as_of: str | None = None) -> dict:
    """Drop whole day partitions older than the retention window — the
    ClickHouse ``TTL toDate(ts) + INTERVAL N DAY DELETE`` policy in its
    ``ttl_only_drop_parts`` mode (expiry = cheap part drop, never a
    row-level rewrite; the mode every high-volume MergeTree deployment
    runs because mutation-based TTL rewrites are the expensive path).

    Pure filesystem operation: the day value is IN the partition path
    (``_day=YYYY-MM-DD``), so expiry neither lists file contents nor
    reads a byte of data — at 100 TB this is O(days) directory renames
    regardless of table size, which is the entire point of partitioning
    the sink by day (write_sink's layout).  ``as_of`` defaults to the
    newest landed day so retention is data-relative and deterministic in
    tests; a scheduler would pass today's date.  Returns accounting;
    the row-level TTL-with-aggregation analog is the registered
    ``r_ttl_rollup`` query."""
    stats = partition_file_stats(path)
    if not stats:
        return {"dropped_partitions": 0, "kept_partitions": 0, "dropped_days": []}
    anchor = as_of or max(stats)
    # lexicographic compare is date order for ISO yyyy-mm-dd values
    cutoff = (
        datetime.date.fromisoformat(anchor)
        - datetime.timedelta(days=keep_days - 1)
    ).isoformat()
    dropped = sorted(d for d in stats if d < cutoff)
    for day in dropped:
        shutil.rmtree(os.path.join(path, f"_day={day}"))
    return {
        "dropped_partitions": len(dropped),
        "kept_partitions": len(stats) - len(dropped),
        "dropped_days": dropped,
    }
