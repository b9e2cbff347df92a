"""Streaming test sources.

The reference's source is a gRPC server pushing batches (D1/D2). With no
network server in scope, the engine's streaming tests replay the
synthetic ``events`` table through Spark's file stream source: the table
is split into N deterministic chunk files, and ``maxFilesPerTrigger=1``
makes each chunk one micro-batch — the exact shape of the reference's
timed flush loop (one buffered batch per tick, D9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bristle_spark.catalog import load_table


def split_events_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4
) -> str:
    """Write events as n_chunks single-file parquet chunks (by event_id
    range, so chunk membership is deterministic), returning the dir."""
    data_dir = os.path.join(out_dir, "chunks")
    if os.path.exists(os.path.join(data_dir, "_done")):
        return data_dir
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    per = (n + n_chunks - 1) // n_chunks
    os.makedirs(data_dir, exist_ok=True)
    ranked = ev.withColumn("_rank", F.row_number().over(Window.orderBy("event_id")))
    for i in range(n_chunks):
        chunk = ranked.filter(
            (F.col("_rank") > i * per) & (F.col("_rank") <= (i + 1) * per)
        ).drop("_rank")
        chunk.coalesce(1).write.mode("overwrite").parquet(os.path.join(data_dir, f"c{i}"))
    # flatten: file source wants one dir of files
    import glob
    import shutil

    base = 1_700_000_000
    for i in range(n_chunks):
        src = glob.glob(os.path.join(data_dir, f"c{i}", "part-*.parquet"))[0]
        dst = os.path.join(data_dir, f"{i:04d}.parquet")
        shutil.copy(src, dst)
        # strictly increasing mtimes: the file stream source orders by
        # modification time, and same-ms writes would make micro-batch
        # composition nondeterministic
        os.utime(dst, (base + i, base + i))
        shutil.rmtree(os.path.join(data_dir, f"c{i}"))
    open(os.path.join(data_dir, "_done"), "w").close()
    return data_dir


def events_file_stream(spark: SparkSession, data_dir: str, schema) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
