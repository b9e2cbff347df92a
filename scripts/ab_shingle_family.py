"""Interleaved A/B for the df-capped shingle family (r15 optimization).

Alternates OLD (groupBy+join df cap, no persist) and NEW (count-window
df cap + persist) formulations of the triangle edge build in one
session, min-of-N each, so host-load noise hits both variants equally.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bristle_spark.catalog import load_table
from bristle_spark.functions.hashing import hash60
from bristle_spark.queries.dedup import (
    MAX_SHINGLE_DF,
    _rare_shingle_hashes,
    _shingle_rows,
)
from bristle_spark.session import get_spark

K = 4  # triangle-family shingle width


def tokens(spark, sf):
    return (
        load_table(spark, sf, "documents")
        .withColumn("t", F.split("text", " "))
        .filter(F.size("t") >= K)
    )


def old_edges(spark, sf):
    d = tokens(spark, sf)
    sh = _shingle_rows(d, k=K).select("doc_id", hash60(F.col("s")).alias("hs"))
    rare = (
        sh.groupBy("hs")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .select("hs")
    )
    shr = sh.join(rare, "hs")
    ea, eb = shr.alias("ea"), shr.alias("eb")
    return (
        ea.join(
            eb,
            (F.col("ea.hs") == F.col("eb.hs"))
            & (F.col("ea.doc_id") < F.col("eb.doc_id")),
        )
        .select(F.col("ea.doc_id").alias("u"), F.col("eb.doc_id").alias("v"))
        .distinct()
    )


def new_edges(spark, sf):
    shr = _rare_shingle_hashes(tokens(spark, sf), k=K).persist()
    ea, eb = shr.alias("ea"), shr.alias("eb")
    return (
        ea.join(
            eb,
            (F.col("ea.hs") == F.col("eb.hs"))
            & (F.col("ea.doc_id") < F.col("eb.doc_id")),
        )
        .select(F.col("ea.doc_id").alias("u"), F.col("eb.doc_id").alias("v"))
        .distinct()
    )


def main() -> None:
    sf = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-shingle-family")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(build):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build(spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    best = {"old": 1e9, "new": 1e9}
    for i in range(rounds):
        for tag, fn in (("old", old_edges), ("new", new_edges)):
            t = run(fn)
            best[tag] = min(best[tag], t)
            print(f"round {i} {tag}: {t:.3f}", flush=True)
    print({k: round(v, 3) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
