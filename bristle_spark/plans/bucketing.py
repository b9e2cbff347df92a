"""Bucketed-table layout: the co-located-join strategy for the 100 TB
design point (SURVEY.md §7 P6).

The reference's physical design knowledge lives in its example DDL —
MergeTree ORDER BY / PARTITION BY (reference examples/binance.sql:15-16).
The Spark-side equivalent for *joins* is bucketing: write both fact
tables bucketed (and sorted) by the join key, and the sort-merge join
needs no shuffle at read time — at 100 TB that's the difference between
re-shuffling terabytes per query and a partition-local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join_demo(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Write lineitem/orders bucketed by orderkey and return
    (bucketed_join, unbucketed_join) over the same data for plan
    comparison."""
    from bristle_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets, ["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], num_buckets, ["o_orderkey"])
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    bucketed = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
    unbucketed = li.join(o, li.l_orderkey == o.o_orderkey)
    return bucketed, unbucketed
