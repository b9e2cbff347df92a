"""Group R — relational/analytic declared queries (SURVEY.md §2.D).

These give the engine parity with the ClickHouse-side analytics of the
reference deployment (the reference itself has no relational operators —
SURVEY.md §2.C); everything here is a Catalyst built-in, so predicate
pushdown / column pruning / join selection come for free.

Float-aggregate convention (keeps Spark ≡ DuckDB under value-hashing):
sums of doubles are rounded to 2 decimals, averages to 6 — fp
non-associativity across partitionings is ~1e-7 absolute at these
magnitudes, far below the rounding grain. Integer aggregates are exact.
All computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bristle_spark.catalog import load_table
from bristle_spark.functions.rounding import r6, r6_sql
from bristle_spark.registry import register


@register(
    "r_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000.0 AND 200000.0
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_custkey % 10 <> 3
    """,
)
def r_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, BETWEEN, IN, LIKE — all pushed
    to the parquet scan by Catalyst (verify via PushedFilters in explain)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000.0, 200000.0)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & (F.col("o_custkey") % 10 != 3)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")


@register(
    "r_hash_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           {r6_sql("avg(l_quantity)")}                                      AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def r_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style grouped aggregation (the flagship query).

    Partial (map-side) aggregation + a single shuffle on the 2 low-
    cardinality group keys; scales linearly with input at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        r6(F.avg("l_quantity")).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "r_distinct_count",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*)                AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def r_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (two-phase partial aggregation in
    Spark: expand + two shuffles, both map-side combined)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


APPROX_DISTINCT_RSD = 0.02  # HLL++ relative standard deviation
APPROX_DISTINCT_SLACK = 4.0  # sigmas of allowed drift in the contract


@register(
    "r_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)               AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           1                                       AS approx_ok
    FROM events GROUP BY 1
    """,
)
def r_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct, validated against the
    sketch's CONTRACT (VERDICT r7 ask #3, the r_approx_percentiles
    discipline): the engine-specific approximation never reaches the
    hash compare — instead the query emits, per group, the exact
    distinct count and an ``approx_ok`` flag asserting the sketch
    landed within SLACK x rsd of it; the oracle states the contract as
    a constant 1. The exact side exists only for the gate — the
    production path at 100 TB is the approx aggregate alone (constant
    memory per group vs the expand-shuffle of exact distinct)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=APPROX_DISTINCT_RSD).alias("ap"),
    )
    tol = APPROX_DISTINCT_SLACK * APPROX_DISTINCT_RSD * F.col("n_users_exact") + 1
    return agg.select(
        "event_type",
        "n_events",
        "n_users_exact",
        (F.abs(F.col("ap") - F.col("n_users_exact")) <= tol).cast("int").alias("approx_ok"),
    )


@register(
    "r_join_inner",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000.0
    """,
)
def r_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; the o_totalprice filter is pushed below the join."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "c_custkey", "c_name", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@register(
    "r_join_broadcast",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def r_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension join with an explicit broadcast hint — no shuffle
    of the fact side; this is the shape every dim join should take at
    100 TB (region/nation are KBs even at SF=100k)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", F.col("r_name").alias("region_name")
    )


@register(
    "r_join_multi",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)                          AS n_items,
           round(sum(l.l_extendedprice), 2)  AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def r_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + aggregation. customer is broadcast (dim), the
    lineitem⋈orders join shuffles on orderkey — at 100 TB both sides
    would be bucketed on orderkey to make this co-located."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "r_join_semi_anti",
    oracle="""
    SELECT c_custkey, 'with_orders' AS tag FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS tag FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def r_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti joins (existence tests without row blowup)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = c.c_custkey == o.o_custkey
    semi = c.join(o, cond, "left_semi").select("c_custkey", F.lit("with_orders").alias("tag"))
    anti = c.join(o, cond, "left_anti").select("c_custkey", F.lit("no_orders").alias("tag"))
    return semi.unionAll(anti)


@register(
    "r_join_outer",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey)                    AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def r_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with NULL-aware aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "r_sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def r_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with a deterministic tiebreak key. Spark plans TakeOrderedAndProject
    — per-partition top-k then a k-row merge, never a full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "r_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, rn, rnk FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
               rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate)             AS rnk
        FROM orders
    ) WHERE rn <= 3
    """,
)
def r_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank windows; row_number carries a full tiebreak so
    results are deterministic across engines."""
    o = load_table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_rk = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "r_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def r_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum frame; the frame order fixes the fp accumulation order,
    so both engines sum identically."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "r_set_ops",
    oracle="""
    SELECT 'both' AS op, n_nationkey FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS op, n_nationkey FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'either' AS op, n_nationkey FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier)
    """,
)
def r_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (distinct) over nation-key sets."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    both = c.intersect(s).select(F.lit("both").alias("op"), "n_nationkey")
    c_only = c.subtract(s).select(F.lit("customer_only").alias("op"), "n_nationkey")
    either = c.union(s).distinct().select(F.lit("either").alias("op"), "n_nationkey")
    return both.unionAll(c_only).unionAll(either)


@register(
    "r_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*)                     AS n,
           round(sum(l_quantity), 2)    AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def r_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total with NULL markers)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "r_string_funcs",
    oracle="""
    SELECT doc_id,
           upper(lang)                                  AS lang_u,
           substr(text, 1, 20)                          AS prefix,
           CAST(length(text) AS BIGINT)                 AS text_len,
           concat(lang, '-', source)                    AS lang_source,
           CAST(contains(text, 'spark') AS INTEGER)     AS has_spark,
           regexp_replace(text, '[aeiou]', '', 'g')     AS devoweled
    FROM documents
    """,
)
def r_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String built-ins: upper/substr/length/concat/contains/regexp_replace.
    (DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.)"""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.substring("text", 1, 20).alias("prefix"),
        F.length("text").cast("bigint").alias("text_len"),
        F.concat_ws("-", "lang", "source").alias("lang_source"),
        F.col("text").contains("spark").cast("int").alias("has_spark"),
        F.regexp_replace("text", "[aeiou]", "").alias("devoweled"),
    )


@register(
    "r_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT)   AS y,
           CAST(month(o_orderdate) AS BIGINT)  AS m,
           date_trunc('month', o_orderdate)    AS month_start,
           count(*)                            AS n,
           round(sum(o_totalprice), 2)         AS total
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def r_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + date_trunc bucketing."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "r_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts)      AS hour_start,
           count(*)                    AS n_events,
           round(sum(value), 2)        AS total_value
    FROM events
    GROUP BY 1
    """,
)
def r_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (batch analog of the streaming window()
    operator; replaces the reference's wall-clock flush tick, reference
    clickhouse_table_writer.go:91-113, with event-time semantics)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "n_events", "total_value")
    )
