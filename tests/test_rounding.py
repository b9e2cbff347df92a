"""Pin the cross-engine rounding-boundary fix (functions/rounding.py):
for a ratio terminating at exactly 7 decimal digits, Spark's round()
(shortest-decimal HALF_UP) and DuckDB's round() (raw double) disagree,
while the IEEE half-up formulation r6/r6_sql agrees by construction."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bristle_spark.functions.rounding import r6, r6_sql, rN, rN_sql

# 333/640 = 0.5203125 exactly — the cume_dist value of the 640-customer
# nation at sf0.1 that produced the round-5 parity failure
BOUNDARY_NUM, BOUNDARY_DEN = 333, 640


def _spark_val(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_native_round_disagrees_on_the_boundary(spark):
    """The motivating bug: the two engines' round() differ here. If this
    ever starts agreeing, the r6 workaround can be reconsidered."""
    expr = F.lit(float(BOUNDARY_NUM)) / F.lit(float(BOUNDARY_DEN))
    spark_rounded = _spark_val(spark, F.round(expr, 6))
    duck_rounded = duckdb.sql(
        f"SELECT round(CAST({BOUNDARY_NUM} AS DOUBLE) / {BOUNDARY_DEN}, 6)"
    ).fetchone()[0]
    assert spark_rounded != duck_rounded, (spark_rounded, duck_rounded)


def test_r6_agrees_on_the_boundary(spark):
    expr = F.lit(float(BOUNDARY_NUM)) / F.lit(float(BOUNDARY_DEN))
    spark_v = _spark_val(spark, r6(expr))
    duck_v = duckdb.sql(
        f"SELECT {r6_sql(f'CAST({BOUNDARY_NUM} AS DOUBLE) / {BOUNDARY_DEN}')}"
    ).fetchone()[0]
    assert spark_v == duck_v


# 3/20000 = 0.00015 exactly — terminates at 5 decimal digits, raw double
# sits just below the boundary, so native round(x, 4) disagrees between
# engines (the l_corpus_stats round-5 failure class at d=4)
D4_NUM, D4_DEN = 3, 20000


def test_native_round_disagrees_at_d4(spark):
    expr = F.lit(float(D4_NUM)) / F.lit(float(D4_DEN))
    spark_rounded = _spark_val(spark, F.round(expr, 4))
    duck_rounded = duckdb.sql(
        f"SELECT round(CAST({D4_NUM} AS DOUBLE) / {D4_DEN}, 4)"
    ).fetchone()[0]
    assert spark_rounded != duck_rounded, (spark_rounded, duck_rounded)


def test_rN_agrees_at_d4(spark):
    expr = F.lit(float(D4_NUM)) / F.lit(float(D4_DEN))
    spark_v = _spark_val(spark, rN(expr, 4))
    duck_v = duckdb.sql(
        f"SELECT {rN_sql(f'CAST({D4_NUM} AS DOUBLE) / {D4_DEN}', 4)}"
    ).fetchone()[0]
    assert spark_v == duck_v


def test_rN_6_is_r6(spark):
    expr = F.lit(float(BOUNDARY_NUM)) / F.lit(float(BOUNDARY_DEN))
    assert _spark_val(spark, rN(expr, 6)) == _spark_val(spark, r6(expr))
    assert rN_sql("x", 6) == r6_sql("x")


def test_rN_property_random_ratios():
    """Property check, no Spark needed: the rN formula is pure IEEE ops
    (mul, add, floor, div), so a Python emulation computes bit-identical
    doubles to both engines — sweep random ratios against DuckDB."""
    import math

    from hypothesis import given, settings, strategies as st

    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(
        k=st.integers(min_value=0, max_value=10**9),
        n=st.integers(min_value=1, max_value=10**9),
        d=st.sampled_from([2, 4, 6, 8]),
    )
    def check(k, n, d):
        scale = 10**d
        py = math.floor((k / n) * scale + 0.5) / scale
        duck = con.execute(
            f"SELECT {rN_sql(f'CAST({k} AS DOUBLE) / {n}', d)}"
        ).fetchone()[0]
        assert py == duck, (k, n, d, py, duck)

    check()


def test_r6_agrees_across_terminating_ratios(spark):
    """Sweep every k/n for the 2^a*5^b denominators that terminate at
    5-8 decimal digits — the whole at-risk family, both engines equal."""
    dens = [64, 128, 160, 320, 512, 625, 640, 800, 3125, 12800]
    rows = [(k, n) for n in dens for k in range(1, n, max(1, n // 97))]
    df = spark.createDataFrame(rows, "k int, n int")
    sp = {
        (r["k"], r["n"]): r["v"]
        for r in df.select(
            "k", "n", r6(F.col("k").cast("double") / F.col("n")).alias("v")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k INT, n INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = {
        (k, n): v
        for k, n, v in con.execute(
            f"SELECT k, n, {r6_sql('CAST(k AS DOUBLE) / n')} FROM t"
        ).fetchall()
    }
    assert sp == duck
