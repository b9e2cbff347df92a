"""Interleaved A/B for r_market_basket's persist-the-items-frame change
(r15 optimization).  Alternates OLD (no persist; every consumer branch
re-derives the distinct (order, part) frame) and NEW (persist) in one
session, min-of-N each, so host-load noise hits both variants equally.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bristle_spark.catalog import load_table
from bristle_spark.queries.stats_q import BASKET_TOP
from bristle_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def build(spark, persist: bool):
    li = load_table(spark, SF, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    if persist:
        items = items.persist()
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    tot = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    enriched = (
        pairs.join(
            F.broadcast(freq.withColumnRenamed("n_item", "n_a")),
            F.col("part_a") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .join(
            F.broadcast(
                freq.withColumnRenamed("n_item", "n_b").withColumnRenamed(
                    "l_partkey", "pk_b"
                )
            ),
            F.col("part_b") == F.col("pk_b"),
        )
        .crossJoin(F.broadcast(tot))
    )
    out = enriched.select(
        "part_a", "part_b", "n_pair",
    ).orderBy(F.desc("n_pair"), "part_a", "part_b").limit(BASKET_TOP)
    return items, out


def run_once(spark, persist: bool) -> float:
    items, out = build(spark, persist)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    if persist:
        items.unpersist()
    return dt


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-market-basket")
    spark.range(1000).selectExpr("sum(id)").collect()
    old_t, new_t = [], []
    run_once(spark, False)
    run_once(spark, True)
    for _ in range(rounds):
        old_t.append(run_once(spark, False))
        new_t.append(run_once(spark, True))
    print(f"OLD min={min(old_t):.3f} all={[round(t, 3) for t in old_t]}")
    print(f"NEW min={min(new_t):.3f} all={[round(t, 3) for t in new_t]}")


if __name__ == "__main__":
    main()
