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
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 4,
    order_col: str = "event_id",
) -> str:
    """Write events as n_chunks single-file parquet chunks (by
    ``order_col`` rank, so chunk membership is deterministic), returning
    the dir.

    ``order_col="event_id"`` (default) replays in ingest order — event
    time arrives shuffled across micro-batches, which is what the
    late-data / watermark-drop queries need. ``order_col="ts"`` replays
    in event-time order — the realistic arrival shape for stateful
    stream-stream joins, where a time-shuffled replay would evict join
    state before cross-chunk matches arrive."""
    data_dir = os.path.join(
        out_dir, "chunks" if order_col == "event_id" else f"chunks_by_{order_col}"
    )
    if os.path.exists(os.path.join(data_dir, "_done")):
        return data_dir
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    per = (n + n_chunks - 1) // n_chunks
    os.makedirs(data_dir, exist_ok=True)
    ranked = ev.withColumn(
        "_rank", F.row_number().over(Window.orderBy(order_col, "event_id"))
    )
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


FLUSH_EVENT_TYPE = "__flush__"


def split_events_files_with_flush(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 4,
    flush_gap_hours: int = 3,
) -> str:
    """Chunk dir like :func:`split_events_files` PLUS one trailing
    sentinel file holding a single far-future ``__flush__`` event.

    Append-mode windowed aggregations only emit a window once the
    watermark passes its end, so without a flush the trailing window per
    group stays in state forever and the landed table under-counts (the
    exact gap between s_late_data's 529 streamed windows and 531 batch
    hours at sf0.001). The sentinel — ``max(ts) + flush_gap_hours``,
    arriving as its own final micro-batch (strictly latest mtime,
    maxFilesPerTrigger=1) — advances the watermark past every real
    window; the no-data micro-batch Spark runs after it (default
    ``noDataMicroBatches.enabled``) evicts and emits them all. Consumers
    filter ``event_type = FLUSH_EVENT_TYPE`` AFTER ``withWatermark`` so
    the sentinel moves event time but lands in no window.

    This mirrors production practice on a 100 TB stream: a keep-alive /
    punctuation event per source partition so watermarks advance through
    quiet periods — it is test *data*, not test-only engine behavior.
    """
    data_dir = os.path.join(out_dir, "chunks_flush")
    if os.path.exists(os.path.join(data_dir, "_done")):
        return data_dir
    import glob
    import shutil

    plain = split_events_files(spark, sf_dir, out_dir, n_chunks=n_chunks)
    os.makedirs(data_dir, exist_ok=True)
    base = 1_700_000_000
    for i, f in enumerate(sorted(glob.glob(os.path.join(plain, "*.parquet")))):
        dst = os.path.join(data_dir, os.path.basename(f))
        shutil.copy(f, dst)
        os.utime(dst, (base + i, base + i))
    ev = load_table(spark, sf_dir, "events")
    # TWO sentinel batches: the watermark advanced by sentinel k is only
    # APPLIED (state evicted, closed windows emitted) while processing
    # batch k+1, and availableNow stops without a trailing no-data batch
    # — so sentinel 1 moves event time past every real window and
    # sentinel 2's batch performs the eviction that emits them.
    for k in range(2):
        sentinel = (
            ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
            .limit(1)
            .select(
                F.lit(-1 - k).cast("bigint").alias("event_id"),
                (
                    F.col("ts") + F.expr(f"INTERVAL {flush_gap_hours + k} HOURS")
                ).alias("ts"),
                F.lit(-1).cast("bigint").alias("user_id"),
                F.lit(FLUSH_EVENT_TYPE).alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
        )
        tmp = os.path.join(data_dir, "_sentinel_build")
        sentinel.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(data_dir, f"zzzz_flush{k}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (base + n_chunks + 1 + k, base + n_chunks + 1 + k))
        shutil.rmtree(tmp)
    open(os.path.join(data_dir, "_done"), "w").close()
    return data_dir


class ReplayStages:
    """Crash/restart simulation for the file-offset source (SURVEY §4
    extension point (a), VERDICT r11 ask #3).

    The file stream source IS offset-replayable: Spark's checkpoint
    records exactly which source files each micro-batch consumed, so a
    restart resumes from the first unconsumed file with the state store
    recovered. This harness makes that a testable two-stage protocol
    around the UNCHANGED streaming queries:

    - stage 1 exposes only the first ``n_first`` source files (the
      stream "crashes" mid-corpus with open state: unclosed windows,
      live dedup keys, partial upsert generations) under a PERSISTENT
      checkpoint;
    - stage 2 exposes every file and re-runs the same query — the
      restart. The recovered run must consume only the unseen files
      and drive the landed state to exactly the single-run/batch-oracle
      result.

    While active (see :func:`replay_stages`), ``events_file_stream``
    re-points the query at a staged copy of its chunk dir (same file
    names, same mtimes, grown between stages) and the queries' run
    helper swaps its throwaway checkpoint for the persistent one.
    """

    def __init__(self, root: str, n_first: int = 2) -> None:
        self.root = root
        self.n_first = n_first
        self.stage = 1

    def stage_dir(self, data_dir: str) -> str:
        import glob
        import hashlib
        import shutil

        staged = os.path.join(
            self.root,
            "staged_" + hashlib.md5(data_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(staged, exist_ok=True)
        files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
        take = files[: self.n_first] if self.stage == 1 else files
        for f in take:
            dst = os.path.join(staged, os.path.basename(f))
            if not os.path.exists(dst):
                shutil.copy(f, dst)
                st = os.stat(f)
                os.utime(dst, (st.st_mtime, st.st_mtime))
        return staged

    def checkpoint_dir(self) -> str:
        d = os.path.join(self.root, "ckpt")
        os.makedirs(d, exist_ok=True)
        return d


_REPLAY: ReplayStages | None = None


def active_replay() -> ReplayStages | None:
    return _REPLAY


from contextlib import contextmanager


@contextmanager
def replay_stages(root: str, n_first: int = 2):
    """Activate the two-stage restart-replay harness; the caller flips
    ``ctl.stage`` between query invocations."""
    global _REPLAY
    if _REPLAY is not None:
        raise RuntimeError("replay_stages does not nest")
    ctl = ReplayStages(root, n_first=n_first)
    _REPLAY = ctl
    try:
        yield ctl
    finally:
        _REPLAY = None


def events_file_stream(spark: SparkSession, data_dir: str, schema) -> DataFrame:
    if _REPLAY is not None:
        data_dir = _REPLAY.stage_dir(data_dir)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
