"""Group R/L round-8 third wave — distributed hypothesis tests and
conformity / inequality / association measures: per-group OLS, Welch's
t-test, two-sample Kolmogorov-Smirnov over source pairs, one-vs-rest
chi-squared term-language association, Benford first-digit conformity,
and the Gini coefficient.

These are the statistical-QA queries a training-data warehouse runs on
landed tables (the reference delegates all relational compute to
ClickHouse — `clickhouse_table_writer.go:115-149` lands rows; SURVEY.md
§2.C): drift tests between sources (KS), feature selection for quality
classifiers (chi²), fraud/synthetic-data screens (Benford), trend and
A/B readouts (OLS, Welch), concentration dashboards (Gini).

Cross-engine determinism contract (same discipline as stats_q.py):
every sufficient statistic is an EXACT BIGINT sum (cents, counts,
integer day indexes); doubles appear only in final closed-form ratios
whose operand order is written identically in the Spark expression and
the oracle SQL, so IEEE arithmetic reproduces bit-for-bit; `sqrt` is
correctly rounded by IEEE-754 and therefore safe; transcendental
constants (Benford's log10(1+1/d)) are inlined as shared literals
computed ONCE in Python rather than evaluated per-engine. Results round
with the shared half-up ``r6``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bristle_spark.catalog import load_table
from bristle_spark.functions.hashing import hash60, hash60_sql
from bristle_spark.functions.rounding import r6, r6_sql
from bristle_spark.registry import register

# ---------------------------------------------------------------------------
# r_ols_by_group

# Fixed x-axis epoch: day index relative to 2020-01-01.  OLS slope is
# shift-invariant; the shift keeps every BIGINT moment (Σd, Σd², Σc·Σd²)
# orders of magnitude inside int64 even at large SF, and pins the
# intercept's meaning ("daily cents at 2020-01-01") identically in both
# engines.
from bristle_spark.functions.timebase import DAY_EPOCH as _OLS_EPOCH  # noqa: E402


@register(
    "r_ols_by_group",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '{_OLS_EPOCH}', CAST(ts AS DATE)) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        FROM events
        GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d) AS BIGINT) AS sd,
               CAST(sum(d * d) AS BIGINT) AS sdd,
               CAST(sum(c) AS BIGINT) AS sc,
               CAST(sum(c * c) AS BIGINT) AS scc,
               CAST(sum(d * c) AS BIGINT) AS sdc
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           {r6_sql('CAST(n * sdc - sd * sc AS DOUBLE) / CAST(n * sdd - sd * sd AS DOUBLE)')} AS slope_cents,
           {r6_sql('CAST(sc * sdd - sd * sdc AS DOUBLE) / CAST(n * sdd - sd * sd AS DOUBLE)')} AS intercept_cents,
           {r6_sql('CAST(n * sdc - sd * sc AS DOUBLE) * CAST(n * sdc - sd * sc AS DOUBLE)'
                   ' / (CAST(n * sdd - sd * sd AS DOUBLE) * CAST(n * scc - sc * sc AS DOUBLE))')} AS r2
    FROM m
    WHERE n * sdd - sd * sd > 0 AND n * scc - sc * sc > 0
    """,
)
def r_ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope / intercept / R²)
    of daily spend vs calendar day — the exact closed-form sibling of
    `r_theil_sen`'s robust estimate, and what warehouses reach
    `regr_slope` for.  Native regr_* aggregates accumulate FLOATS in
    shuffle order, which is non-deterministic across engines AND across
    reruns; here every sufficient statistic (n, Σd, Σd², Σc, Σc², Σdc)
    is an exact BIGINT sum over integer day indexes and BIGINT daily
    cents, and the three estimates are closed-form double ratios of
    those exact moments — bit-identical in any execution order.

    Scale shape: one corpus-sized map-side-combined shuffle to daily
    (type, day) cents; the moment rollup re-aggregates the |types|×|days|
    frame.  No windows, no joins.  (At extreme per-day magnitudes the
    Σc² moment is the first to approach int64 — the standard fix is
    centering c by a per-group first pass, trading one more tiny
    aggregation for headroom.)
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit(_OLS_EPOCH).cast("date")).alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("c")
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
        F.sum(F.col("d") * F.col("c")).cast("bigint").alias("sdc"),
    )
    sxx = F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    syy = F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")
    sxy = F.col("n") * F.col("sdc") - F.col("sd") * F.col("sc")
    return (
        m.filter((sxx > 0) & (syy > 0))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            r6(sxy.cast("double") / sxx.cast("double")).alias("slope_cents"),
            r6(
                (F.col("sc") * F.col("sdd") - F.col("sd") * F.col("sdc")).cast("double")
                / sxx.cast("double")
            ).alias("intercept_cents"),
            r6(
                sxy.cast("double") * sxy.cast("double")
                / (sxx.cast("double") * syy.cast("double"))
            ).alias("r2"),
        )
    )


# ---------------------------------------------------------------------------
# r_welch_ttest


@register(
    "r_welch_ttest",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sv,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                        * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS svv
        FROM events GROUP BY event_type
    ),
    st AS (
        SELECT event_type, n, CAST(sv AS DOUBLE) / n AS mean_c,
               CAST(n * svv - sv * sv AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS var_c
        FROM m WHERE n >= 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n AS n_a, b.n AS n_b,
           {r6_sql('(a.mean_c - b.mean_c) / 100.0')} AS mean_diff,
           {r6_sql('(a.mean_c - b.mean_c) / sqrt(a.var_c / a.n + b.var_c / b.n)')} AS t_stat,
           {r6_sql('(a.var_c / a.n + b.var_c / b.n) * (a.var_c / a.n + b.var_c / b.n)'
                   ' / ((a.var_c / a.n) * (a.var_c / a.n) / (a.n - 1)'
                   '    + (b.var_c / b.n) * (b.var_c / b.n) / (b.n - 1))')} AS df_welch
    FROM st a JOIN st b ON a.event_type < b.event_type
    """,
)
def r_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between every pair of event
    types on the event value — the A/B readout that doesn't assume
    pooled variance, with the Welch–Satterthwaite effective df.

    Sufficient statistics (n, Σv, Σv² in BIGINT cents) reduce in one
    map-side-combined pass; mean and sample variance are closed-form
    double ratios of exact integers, so the t statistic cannot drift
    with shuffle order (the reason this is NOT var_samp()+avg(), whose
    float accumulation differs run to run).  The pair frame is the
    |types|² self-join of a |types|-row aggregate — broadcast, bounded.

    Int64 headroom (mirrors r_ols_by_group's note): the raw Σc² moment
    is bounded by n·C² and the variance numerator n·Σc² − (Σc)² by
    n²·C², C = max |cents|; with C ≤ 10⁶ (|value| ≤ $10k) the bound
    stays inside 2⁶³ up to n ≈ 3·10⁶ rows per event_type, several
    orders beyond the fixture SFs.  Beyond that, Spark's non-ANSI sum
    would wrap silently while DuckDB widens to HUGEINT — the standard
    fix is centering cents by a per-group first pass (one extra tiny
    aggregation) before squaring, exactly as r_ols_by_group documents
    for its Σc² moment.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("sv"),
        F.sum(cents * cents).cast("bigint").alias("svv"),
    )
    st = m.filter(F.col("n") >= 2).select(
        "event_type",
        "n",
        (F.col("sv").cast("double") / F.col("n")).alias("mean_c"),
        (
            (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ).alias("var_c"),
    )
    a = st.alias("a")
    b = st.alias("b")
    se2 = F.col("a.var_c") / F.col("a.n") + F.col("b.var_c") / F.col("b.n")
    return a.join(
        F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        r6((F.col("a.mean_c") - F.col("b.mean_c")) / 100.0).alias("mean_diff"),
        r6((F.col("a.mean_c") - F.col("b.mean_c")) / F.sqrt(se2)).alias("t_stat"),
        r6(
            se2
            * se2
            / (
                (F.col("a.var_c") / F.col("a.n"))
                * (F.col("a.var_c") / F.col("a.n"))
                / (F.col("a.n") - 1)
                + (F.col("b.var_c") / F.col("b.n"))
                * (F.col("b.var_c") / F.col("b.n"))
                / (F.col("b.n") - 1)
            )
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# l_ks_test


@register(
    "l_ks_test",
    oracle=f"""
    WITH cnt AS (
        SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.source, g.v, COALESCE(cnt.c, 0) AS c
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN (SELECT DISTINCT n_chars AS v FROM documents) g
        LEFT JOIN cnt ON cnt.source = s.source AND cnt.v = g.v
    ),
    ecdf AS (
        SELECT source, v,
               sum(c) OVER (
                   PARTITION BY source ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               sum(c) OVER (PARTITION BY source) AS n
        FROM grid
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(max(a.n) AS BIGINT) AS n_a, CAST(max(b.n) AS BIGINT) AS n_b,
           CAST(max(abs(b.n * a.cum - a.n * b.cum)) AS BIGINT) AS d_num,
           {r6_sql('CAST(max(abs(b.n * a.cum - a.n * b.cum)) AS DOUBLE)'
                   ' / (max(a.n) * max(b.n))')} AS d_stat,
           {r6_sql('CAST(max(abs(b.n * a.cum - a.n * b.cum)) AS DOUBLE)'
                   ' / (max(a.n) * max(b.n))'
                   ' * sqrt(CAST(max(a.n) * max(b.n) AS DOUBLE) / (max(a.n) + max(b.n)))')}
               AS ks_scaled
    FROM ecdf a JOIN ecdf b ON a.v = b.v AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def l_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the document-
    length distributions of every pair of sources — the standard drift
    detector for "did source X start shipping different-shaped docs".
    D = max |ECDF_a − ECDF_b|; `ks_scaled` = D·sqrt(n_a·n_b/(n_a+n_b))
    is the statistic compared against the Kolmogorov critical values.

    Integer-exactness: the sup runs over |n_b·cum_a − n_a·cum_b| — pure
    BIGINT, so the argmax cannot flip on float rounding; the two final
    ratios are closed-form doubles of exact integers (sqrt is IEEE
    correctly-rounded).

    Scale shape: the ONLY corpus-sized shuffle is the (source, length)
    count; everything downstream operates on the distribution grid
    (|sources| × |distinct lengths|), with per-source window partitions
    bounded by the distinct-value count.  The pair join is
    grid-vs-grid, never row-vs-row — the ECDF alignment trick that
    makes all-pairs KS affordable at any corpus size (pair count is a
    property of the source dimension, not the data volume).
    """
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    sources = docs.select("source").distinct()
    values = docs.select(F.col("n_chars").alias("v")).distinct()
    grid = (
        sources.crossJoin(F.broadcast(values))
        .join(cnt, ["source", "v"], "left")
        .select("source", "v", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ecdf = grid.select(
        "source",
        "v",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
        # both sides of the pair join consume this grid-sized frame and
        # the alias rename defeats runtime exchange reuse — persist so
        # the corpus-sized (source, length) count runs once (r15)
    ).persist()
    a = ecdf.alias("a")
    b = ecdf.alias("b")
    diff = F.abs(F.col("b.n") * F.col("a.cum") - F.col("a.n") * F.col("b.cum"))
    paired = a.join(
        b, (F.col("a.v") == F.col("b.v")) & (F.col("a.source") < F.col("b.source"))
    ).groupBy(
        F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
    ).agg(
        F.max(F.col("a.n")).cast("bigint").alias("n_a"),
        F.max(F.col("b.n")).cast("bigint").alias("n_b"),
        F.max(diff).cast("bigint").alias("d_num"),
    )
    d_stat = F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b"))
    return paired.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "d_num",
        r6(d_stat).alias("d_stat"),
        r6(
            d_stat
            * F.sqrt(
                (F.col("n_a") * F.col("n_b")).cast("double")
                / (F.col("n_a") + F.col("n_b"))
            )
        ).alias("ks_scaled"),
    )


# ---------------------------------------------------------------------------
# l_chi2_terms

CHI2_TOP_TERMS = 200


@register(
    "l_chi2_terms",
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tl AS (SELECT term, lang, CAST(count(*) AS BIGINT) AS a FROM dt GROUP BY 1, 2),
    tf AS (SELECT term, CAST(sum(a) AS BIGINT) AS df_term FROM tl GROUP BY term),
    lf0 AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_lang FROM documents GROUP BY lang),
    tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_total FROM documents),
    lf AS (SELECT lang, n_lang FROM lf0, tot WHERE n_lang < n_total),
    top AS (
        SELECT term, df_term FROM tf, tot
        WHERE df_term < n_total
        ORDER BY df_term DESC, term
        LIMIT {CHI2_TOP_TERMS}
    ),
    cells AS (
        SELECT top.term, lf.lang, top.df_term, lf.n_lang, tot.n_total,
               COALESCE(tl.a, 0) AS a
        FROM top CROSS JOIN lf CROSS JOIN tot
        LEFT JOIN tl ON tl.term = top.term AND tl.lang = lf.lang
    )
    SELECT term, lang, a AS df_term_lang, df_term, n_lang,
           {r6_sql('CAST(df_term AS DOUBLE) * n_lang / n_total')} AS expected,
           {r6_sql('CAST(n_total AS DOUBLE)'
                   ' * CAST(a * (n_total - df_term - n_lang + a) - (df_term - a) * (n_lang - a) AS DOUBLE)'
                   ' * CAST(a * (n_total - df_term - n_lang + a) - (df_term - a) * (n_lang - a) AS DOUBLE)'
                   ' / (CAST(df_term AS DOUBLE) * CAST(n_total - df_term AS DOUBLE)'
                   '    * CAST(n_lang AS DOUBLE) * CAST(n_total - n_lang AS DOUBLE))')} AS chi2
    FROM cells
    """,
)
def l_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest chi-squared association between term presence and
    language for the {CHI2_TOP_TERMS} highest-document-frequency terms —
    the classic feature-selection statistic for building language /
    quality classifiers from a corpus (each (term, lang) cell scores a
    2x2 presence table with the closed form
    chi² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))).

    Determinism: a (doc-frequency of term IN lang) and all margins are
    exact BIGINT counts over DISTINCT (doc, term) pairs; (ad−bc) is
    computed IN BIGINT (|ad−bc| ≤ N² /4 fits comfortably), and only the
    final single-ratio chi² is a double — no cross-cell float summation
    anywhere, which is why the 2x2 closed form beats the L-cell Σ(O−E)²/E
    formulation for cross-engine parity.  Terms present in EVERY doc
    carry zero information and a zero (c+d) margin, so they are excluded
    in the top-term selection; symmetrically, a lang covering EVERY doc
    zeroes the (b+d) margin and is excluded from the lang frame (both
    guards live in the Spark plan AND the oracle SQL).

    Scale shape: the corpus-sized shuffles are the distinct (doc, lang,
    term) explode and its (term, lang) rollup, both map-side combined;
    the top-K funnel is a TakeOrderedAndProject with (df desc, term)
    tie-breaks; the cell frame is top-K × |langs| built from broadcast
    dimension frames.
    """
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    # the vocab x langs rollup feeds TWO branches (the top-term funnel
    # via tf and the cell join) — persist it so the corpus-sized
    # explode + distinct runs once (r15, guide §5)
    tl = (
        dt.groupBy("term", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("a"))
        .persist()
    )
    tf = tl.groupBy("term").agg(F.sum("a").cast("bigint").alias("df_term"))
    tot = docs.agg(F.countDistinct("doc_id").cast("bigint").alias("n_total"))
    # Langs covering EVERY doc zero the (n_total - n_lang) margin — Spark's
    # non-ANSI divide NULLs where DuckDB's double division yields inf, so
    # the guard mirrors the df_term < n_total one (ADVICE r8).
    lf = (
        docs.groupBy("lang")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_lang"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_lang") < F.col("n_total"))
        .select("lang", "n_lang")
    )
    top = (
        tf.crossJoin(F.broadcast(tot))
        .filter(F.col("df_term") < F.col("n_total"))
        .orderBy(F.desc("df_term"), "term")
        .limit(CHI2_TOP_TERMS)
        .select("term", "df_term")
    )
    cells = (
        F.broadcast(top)
        .crossJoin(F.broadcast(lf))
        .crossJoin(F.broadcast(tot))
        .join(tl, ["term", "lang"], "left")
        .select(
            "term",
            "lang",
            "df_term",
            "n_lang",
            "n_total",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        )
    )
    # x = ad - bc over the 2x2 presence table, kept in BIGINT
    x = (
        F.col("a") * (F.col("n_total") - F.col("df_term") - F.col("n_lang") + F.col("a"))
        - (F.col("df_term") - F.col("a")) * (F.col("n_lang") - F.col("a"))
    )
    return cells.select(
        "term",
        "lang",
        F.col("a").alias("df_term_lang"),
        "df_term",
        "n_lang",
        r6(F.col("df_term").cast("double") * F.col("n_lang") / F.col("n_total")).alias(
            "expected"
        ),
        r6(
            F.col("n_total").cast("double")
            * x.cast("double")
            * x.cast("double")
            / (
                F.col("df_term").cast("double")
                * (F.col("n_total") - F.col("df_term")).cast("double")
                * F.col("n_lang").cast("double")
                * (F.col("n_total") - F.col("n_lang")).cast("double")
            )
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# r_benford

# Benford shares inlined ONCE from Python so both engines parse the SAME
# double literal instead of each evaluating log10 (whose last ulp is not
# guaranteed to agree across runtimes).
_BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE first_digit "
    # CAST keeps both parsers in IEEE double — a bare decimal literal is
    # DECIMAL in Spark SQL and DuckDB alike, and decimal math overflows
    # under the r6 floor(x*1e6) identity.
    + " ".join(f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items())
    + " END"
)


@register(
    "r_benford",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS first_digit
        FROM orders
        WHERE floor(o_totalprice * 100 + 0.5) > 0
    ),
    cnt AS (SELECT first_digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY first_digit),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM digits)
    SELECT first_digit, n,
           {r6_sql('CAST(n AS DOUBLE) / n_total')} AS obs_share,
           {r6_sql(_BENFORD_CASE)} AS benford_share,
           {r6_sql(f'(CAST(n AS DOUBLE) - CAST(n_total AS DOUBLE) * ({_BENFORD_CASE}))'
                   f' * (CAST(n AS DOUBLE) - CAST(n_total AS DOUBLE) * ({_BENFORD_CASE}))'
                   f' / (CAST(n_total AS DOUBLE) * ({_BENFORD_CASE}))')} AS chi2_term
    FROM cnt CROSS JOIN tot
    ORDER BY first_digit
    """,
)
def r_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformity of order totals: the
    observed digit distribution vs Benford's law log10(1+1/d), with the
    per-digit chi-squared contribution — the screen auditors run for
    fabricated or synthetically-generated monetary data.

    Determinism: the first digit comes from the decimal string of exact
    BIGINT cents (no float log extraction); the Benford shares are
    17-significant-digit literals rendered ONCE in Python and inlined
    into BOTH the Spark expression and the oracle SQL, so neither engine
    evaluates log10 at run time.  Per-digit chi² terms are reported
    per-row (the 9-row frame) rather than float-summed across rows.

    Scale shape: one map-side-combined count per digit (9 groups); the
    grand total is a broadcast 1-row aggregate joined to the digit frame
    (the no-global-window discipline).  Nothing else touches the corpus.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    digits = orders.filter(cents > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("first_digit")
    )
    cnt = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = digits.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    cnt = cnt.crossJoin(F.broadcast(tot))
    p = F.expr(_BENFORD_CASE)
    dev = F.col("n").cast("double") - F.col("n_total").cast("double") * p
    return cnt.select(
        "first_digit",
        "n",
        r6(F.col("n").cast("double") / F.col("n_total")).alias("obs_share"),
        r6(p).alias("benford_share"),
        r6(dev * dev / (F.col("n_total").cast("double") * p)).alias("chi2_term"),
    ).orderBy("first_digit")


# ---------------------------------------------------------------------------
# r_gini


@register(
    "r_gini",
    oracle=f"""
    WITH rev AS (
        SELECT c.c_mktsegment, o.o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT c_mktsegment, cents,
               row_number() OVER (
                   PARTITION BY c_mktsegment ORDER BY cents, o_custkey
               ) AS i
        FROM rev
    ),
    agg AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(i * cents) AS BIGINT) AS swx
        FROM ranked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_customers, total_cents,
           {r6_sql('CAST(2 * swx - (n_customers + 1) * total_cents AS DOUBLE)'
                   ' / CAST(n_customers * total_cents AS DOUBLE)')} AS gini
    FROM agg
    WHERE total_cents > 0
    """,
)
def r_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    inequality/concentration scalar behind `r_pareto_share`'s prefix
    view, via the rank formula G = (2·Σi·x_i − (n+1)·Σx)/(n·Σx) over
    ascending-sorted revenues.

    Determinism: revenues are BIGINT cents; the rank weights come from
    row_number over (cents, custkey) — within a tie block Σi·x is
    invariant to tie order, so the custkey tie-break only pins engine
    plans, not the result; the single ratio is exact-BIGINT numerator
    and denominator cast to double.  Scale shape: revenue pre-aggregates
    per (segment, customer) with map-side combine; the ranking window
    partitions by segment (never global); the moment rollup rides the
    same segment keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_custkey")
    ranked = rev.select(
        "c_mktsegment", "cents", F.row_number().over(w).alias("i")
    )
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("swx"),
    )
    return agg.filter(F.col("total_cents") > 0).select(
        "c_mktsegment",
        "n_customers",
        "total_cents",
        r6(
            (
                2 * F.col("swx") - (F.col("n_customers") + 1) * F.col("total_cents")
            ).cast("double")
            / (F.col("n_customers") * F.col("total_cents")).cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# r_mann_whitney

# Day-of-week derived as pure integer arithmetic from a known Monday so
# both engines agree (Spark dayofweek is 1=Sunday, DuckDB dayofweek is
# 0=Sunday — neither matches the other, so we use neither).
_MW_MONDAY = "2020-01-06"


@register(
    "r_mann_whitney",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
               CAST(CASE WHEN ((date_diff('day', DATE '{_MW_MONDAY}', CAST(ts AS DATE)) % 7) + 7) % 7 >= 5
                    THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
        FROM events
    ),
    ranked AS (
        SELECT event_type, vc, is_weekend,
               CAST(rank() OVER (PARTITION BY event_type ORDER BY vc) AS BIGINT) AS rk,
               CAST(count(*) OVER (PARTITION BY event_type, vc) AS BIGINT) AS teq
        FROM src
    ),
    agg AS (
        SELECT event_type,
               CAST(sum(is_weekend) AS BIGINT) AS n_a,
               CAST(sum(1 - is_weekend) AS BIGINT) AS n_b,
               CAST(sum(is_weekend * (2 * rk + teq - 1)) AS BIGINT) AS r2a,
               CAST(sum(teq * teq - 1) AS BIGINT) AS tie3
        FROM ranked GROUP BY event_type
    )
    SELECT event_type, n_a AS n_weekend, n_b AS n_weekday,
           CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_weekend,
           {r6_sql('CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE)')} AS auc_weekend,
           {r6_sql('(CAST(r2a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a * n_b AS DOUBLE))'
                   ' / (2.0 * sqrt(CAST(n_a * n_b AS DOUBLE)'
                   '     * (CAST(n_a + n_b + 1 AS DOUBLE)'
                   '        - CAST(tie3 AS DOUBLE) / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE))'
                   '     / 12.0))')} AS z_score
    FROM agg
    WHERE n_a > 0 AND n_b > 0
    """,
)
def r_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (the ClickHouse `mannWhitneyUTest`
    analog) per event type: do weekend event values stochastically
    dominate weekday values?  Reports the U statistic, the equivalent
    AUC (P(weekend value > weekday value) + ½·P(tie) — the rank-sum AUC
    estimator used for classifier eval), and the tie-corrected normal
    z-score.  The nonparametric sibling of `r_welch_ttest`.

    Determinism: fractional tie ranks are kept as EXACT BIGINT doubled
    ranks (2·r = 2·rank() + t_eq − 1, integer even through .5 tie
    averages), so the rank sum, the doubled U (u2 = 2·U), and the tie
    term Σ(t³−t) (accumulated per-row as Σ(t_eq²−1), one pass, no
    second frame) are all exact integer sums; doubles appear only in
    the closed-form AUC and z ratios written identically in both
    engines.  Weekend/weekday comes from integer day arithmetic
    anchored at a known Monday, not engine dayofweek conventions.

    Scale shape: one rank window partitioned by event_type (never
    global), one map-side-combined rollup to |event_types| rows.  At
    extreme per-type N the rank window is the cost — the standard
    scale fix is pre-bucketing values to bounded histograms and
    ranking bucket boundaries, the same trade r_percentile_disc makes.
    """
    ev = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    dow = ((F.datediff(F.col("ts").cast("date"), F.lit(_MW_MONDAY).cast("date")) % 7) + 7) % 7
    src = ev.select(
        "event_type",
        vc.alias("vc"),
        F.when(dow >= 5, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("is_weekend"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("vc")
    w_eq = Window.partitionBy("event_type", "vc")
    ranked = src.select(
        "event_type",
        "is_weekend",
        F.rank().over(w_rank).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(w_eq).cast("bigint").alias("teq"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("is_weekend").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("is_weekend")).cast("bigint").alias("n_b"),
        F.sum(F.col("is_weekend") * (2 * F.col("rk") + F.col("teq") - 1))
        .cast("bigint")
        .alias("r2a"),
        F.sum(F.col("teq") * F.col("teq") - 1).cast("bigint").alias("tie3"),
    )
    u2 = (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)).cast("bigint")
    n = F.col("n_a") + F.col("n_b")
    sigma2x4 = (
        (F.col("n_a") * F.col("n_b")).cast("double")
        * (
            (n + 1).cast("double")
            - F.col("tie3").cast("double") / (n * (n - 1)).cast("double")
        )
        / F.lit(12.0)
    )
    return agg.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "event_type",
        F.col("n_a").alias("n_weekend"),
        F.col("n_b").alias("n_weekday"),
        u2.alias("u2_weekend"),
        r6(u2.cast("double") / (2 * F.col("n_a") * F.col("n_b")).cast("double")).alias(
            "auc_weekend"
        ),
        r6(
            (u2.cast("double") - (F.col("n_a") * F.col("n_b")).cast("double"))
            / (F.lit(2.0) * F.sqrt(sigma2x4))
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# r_spearman_corr


@register(
    "r_spearman_corr",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
               CAST(hour(ts) AS BIGINT) AS hr
        FROM events
    ),
    ranked AS (
        SELECT event_type,
               CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY vc)
                    + count(*) OVER (PARTITION BY event_type, vc) - 1 AS BIGINT) AS r2x,
               CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY hr)
                    + count(*) OVER (PARTITION BY event_type, hr) - 1 AS BIGINT) AS r2y,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM src
    ),
    centered AS (
        SELECT event_type, n, r2x - (n + 1) AS cx, r2y - (n + 1) AS cy
        FROM ranked
    ),
    agg AS (
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n,
               CAST(sum(cx * cy) AS BIGINT) AS sxy,
               CAST(sum(cx * cx) AS BIGINT) AS sxx,
               CAST(sum(cy * cy) AS BIGINT) AS syy
        FROM centered GROUP BY event_type
    )
    SELECT event_type, n, sxy, sxx, syy,
           {r6_sql('CAST(sxy AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))')} AS spearman_rho
    FROM agg
    WHERE sxx > 0 AND syy > 0
    """,
)
def r_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (the ClickHouse `rankCorr` analog) per
    event type between event value and hour-of-day — the monotone-
    association screen for "does spend drift across the day", robust to
    the value distribution's shape where `r_stats_agg`'s Pearson corr is
    not.  Hour has only 24 distinct values, so the fractional-rank tie
    handling (identical to scipy's `spearmanr`) is exercised hard.

    Determinism: doubled fractional ranks 2·r = 2·rank() + t_eq − 1 are
    exact BIGINTs; centering by their known mean (N+1) makes Σc = 0 an
    algebraic identity, so ρ = Σcxcy / (√Σcx²·√Σcy²) needs only three
    exact BIGINT moments and one final double ratio.  |c| ≤ N bounds
    Σc² ≤ N³ — int64-safe through sf10 per event type; beyond that the
    standard fix is scaling ranks to a bounded grid before the moment
    pass (the r_ols_by_group headroom note, same trade).

    Scale shape: two rank windows sharing the event_type partition and a
    map-side-combined moment rollup to |event_types| rows; no joins.
    """
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
        F.hour("ts").cast("bigint").alias("hr"),
    )
    w_t = Window.partitionBy("event_type")
    r2x = (
        2 * F.rank().over(w_t.orderBy("vc"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "vc"))
        - 1
    ).cast("bigint")
    r2y = (
        2 * F.rank().over(w_t.orderBy("hr"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "hr"))
        - 1
    ).cast("bigint")
    ranked = src.select(
        "event_type",
        r2x.alias("r2x"),
        r2y.alias("r2y"),
        F.count(F.lit(1)).over(w_t).cast("bigint").alias("n"),
    )
    centered = ranked.select(
        "event_type",
        "n",
        (F.col("r2x") - (F.col("n") + 1)).alias("cx"),
        (F.col("r2y") - (F.col("n") + 1)).alias("cy"),
    )
    agg = centered.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("cx") * F.col("cy")).cast("bigint").alias("sxy"),
        F.sum(F.col("cx") * F.col("cx")).cast("bigint").alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).cast("bigint").alias("syy"),
    )
    return agg.filter((F.col("sxx") > 0) & (F.col("syy") > 0)).select(
        "event_type",
        "n",
        "sxy",
        "sxx",
        "syy",
        r6(
            F.col("sxy").cast("double")
            / (F.sqrt(F.col("sxx").cast("double")) * F.sqrt(F.col("syy").cast("double")))
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# r_cramers_v

# chi² is accumulated in integer micro-units (floor(term·1e6 + 0.5) per
# cell, BIGINT-summed) because a cross-cell DOUBLE sum is shuffle-order-
# dependent; the quantization IS the defined semantics, identical in
# both engines, and bounds the chi² error by |cells|·5e-7.
_CV_SCALE = 1_000_000


@register(
    "r_cramers_v",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               ((date_diff('day', DATE '{_MW_MONDAY}', CAST(ts AS DATE)) % 7) + 7) % 7 AS dow
        FROM events
    ),
    cells0 AS (
        SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_ij
        FROM src GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, CAST(sum(n_ij) AS BIGINT) AS r_i FROM cells0 GROUP BY 1),
    cols_ AS (SELECT dow, CAST(sum(n_ij) AS BIGINT) AS c_j FROM cells0 GROUP BY 1),
    tot AS (
        SELECT CAST(sum(n_ij) AS BIGINT) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
               CAST(count(DISTINCT dow) AS BIGINT) AS nc
        FROM cells0
    ),
    grid AS (
        SELECT rows_.event_type, cols_.dow, rows_.r_i, cols_.c_j, tot.n, tot.nr, tot.nc,
               COALESCE(cells0.n_ij, 0) AS n_ij
        FROM rows_ CROSS JOIN cols_ CROSS JOIN tot
        LEFT JOIN cells0 ON cells0.event_type = rows_.event_type AND cells0.dow = cols_.dow
    ),
    terms AS (
        SELECT n, nr, nc,
               CAST(floor(
                   CAST(n_ij * n - r_i * c_j AS DOUBLE) * CAST(n_ij * n - r_i * c_j AS DOUBLE)
                   / (CAST(r_i AS DOUBLE) * CAST(c_j AS DOUBLE) * CAST(n AS DOUBLE))
                   * {_CV_SCALE} + 0.5) AS BIGINT) AS micro
        FROM grid
    )
    SELECT CAST(max(n) AS BIGINT) AS n_total,
           CAST(max(nr) AS BIGINT) AS n_rows,
           CAST(max(nc) AS BIGINT) AS n_cols,
           CAST(sum(micro) AS BIGINT) AS chi2_micro,
           {r6_sql(f'CAST(sum(micro) AS DOUBLE) / {_CV_SCALE}')} AS chi2,
           {r6_sql(f'sqrt(CAST(sum(micro) AS DOUBLE) / {_CV_SCALE}'
                   ' / (CAST(max(n) AS DOUBLE)'
                   '    * CAST(CASE WHEN max(nr) < max(nc) THEN max(nr) ELSE max(nc) END - 1 AS DOUBLE)))')} AS cramers_v
    FROM terms
    """,
)
def r_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between event type and day-of-week (the
    ClickHouse `cramersV` analog): the [0,1]-normalized chi-squared over
    the full R×C contingency grid, including structurally-zero cells
    (which still carry expected mass r_i·c_j/N).  The categorical
    sibling of `r_stats_agg`'s corr and `l_chi2_terms`' 2×2 form.

    Determinism: cell counts and margins are exact BIGINTs; each cell's
    chi² term is the closed form (n_ij·N − r_i·c_j)²/(r_i·c_j·N)
    evaluated in identically-ordered double arithmetic, then QUANTIZED
    to integer micro-units and BIGINT-summed — a cross-cell double sum
    would be shuffle-order-dependent, the exact failure l_chi2_terms
    dodges by never summing cells; here the scalar test statistic IS
    the product, so the quantized-sum semantics (error ≤ |cells|·5e-7,
    far under the r6 report grain) is the cross-engine contract.
    (n_ij·N − r_i·c_j is an exact BIGINT — |·| ≤ N² is int64-safe
    through N≈3e9 — cast to double only for the squaring, which would
    need 4·log2(N) bits no integer register has.)

    Scale shape: one map-side-combined count to the bounded R×7 cell
    frame; margins and the grid are broadcast joins over that bounded
    frame; the final rollup is a 1-row aggregate.  The corpus is
    touched exactly once.
    """
    ev = load_table(spark, sf_dir, "events")
    dow = ((F.datediff(F.col("ts").cast("date"), F.lit(_MW_MONDAY).cast("date")) % 7) + 7) % 7
    cells0 = ev.select("event_type", dow.alias("dow")).groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ij")
    )
    rows_ = cells0.groupBy("event_type").agg(F.sum("n_ij").cast("bigint").alias("r_i"))
    cols_ = cells0.groupBy("dow").agg(F.sum("n_ij").cast("bigint").alias("c_j"))
    tot = cells0.agg(
        F.sum("n_ij").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("nr"),
        F.countDistinct("dow").cast("bigint").alias("nc"),
    )
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cells0), ["event_type", "dow"], "left")
        .select(
            "r_i",
            "c_j",
            "n",
            "nr",
            "nc",
            F.coalesce(F.col("n_ij"), F.lit(0)).alias("n_ij"),
        )
    )
    dev = (F.col("n_ij") * F.col("n") - F.col("r_i") * F.col("c_j")).cast("double")
    term = dev * dev / (
        F.col("r_i").cast("double") * F.col("c_j").cast("double") * F.col("n").cast("double")
    )
    terms = grid.select(
        "n",
        "nr",
        "nc",
        F.floor(term * _CV_SCALE + F.lit(0.5)).cast("bigint").alias("micro"),
    )
    chi2 = F.sum("micro").cast("double") / F.lit(float(_CV_SCALE))
    min_dim = F.when(F.max("nr") < F.max("nc"), F.max("nr")).otherwise(F.max("nc"))
    return terms.agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.max("nr").cast("bigint").alias("n_rows"),
        F.max("nc").cast("bigint").alias("n_cols"),
        F.sum("micro").cast("bigint").alias("chi2_micro"),
        r6(chi2).alias("chi2"),
        r6(
            F.sqrt(
                chi2
                / (F.max("n").cast("double") * (min_dim - 1).cast("double"))
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# r_mann_kendall


@register(
    "r_mann_kendall",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '{_OLS_EPOCH}', CAST(ts AS DATE)) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY a.event_type
    ),
    ties AS (
        SELECT event_type,
               CAST(sum(t) AS BIGINT) AS n,
               CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_var,
               CAST(COALESCE(sum(t * (t - 1)), 0) AS BIGINT) AS tie_pairs
        FROM (
            SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, c
        ) GROUP BY event_type
    )
    SELECT s.event_type, ties.n AS n_days, s.s_stat,
           {r6_sql('(CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)'
                   '      WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)'
                   '      ELSE 0.0 END)'
                   ' / sqrt(CAST(ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie_var AS DOUBLE) / 18.0)')} AS z_score,
           {r6_sql('CAST(s.s_stat AS DOUBLE)'
                   ' / (sqrt(CAST(ties.n * (ties.n - 1) / 2 - ties.tie_pairs / 2 AS DOUBLE))'
                   '    * sqrt(CAST(ties.n * (ties.n - 1) / 2 AS DOUBLE)))')} AS tau_b
    FROM s JOIN ties ON s.event_type = ties.event_type
    """,
)
def r_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test with Kendall's tau-b on the
    daily spend series per event type — the nonparametric trend screen
    (is the series rising?) that pairs with `r_theil_sen`'s robust
    slope ESTIMATE and `r_ols_by_group`'s parametric fit: S counts
    concordant minus discordant day pairs, the z-score applies the
    standard continuity correction and tie-corrected variance
    (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18, and tau-b normalizes S by the
    tie-adjusted pair counts (time has no ties; values might).

    Determinism: S, both tie terms, and every variance operand are
    exact BIGINT sums; doubles appear only in the two closed-form
    ratios written identically in both engines.

    Scale shape: the corpus collapses to the |types|×|days| daily
    frame FIRST (one map-side-combined shuffle); the pairwise
    self-join runs on that bounded frame (|days|² per type — ~130k
    pairs/type/year, constant in corpus size), exactly the bound
    r_theil_sen documents.  Never all-pairs on raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit(_OLS_EPOCH).cast("date")).alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("c")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    tie_groups = daily.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    ties = tie_groups.groupBy("event_type").agg(
        F.sum("t").cast("bigint").alias("n"),
        F.coalesce(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
        )
        .cast("bigint")
        .alias("tie_var"),
        F.coalesce(F.sum(F.col("t") * (F.col("t") - 1)), F.lit(0))
        .cast("bigint")
        .alias("tie_pairs"),
    )
    j = s.join(ties, "event_type")
    z_num = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    n = F.col("n")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_var")).cast("double") / F.lit(18.0)
    n0 = n * (n - 1) / 2
    return j.select(
        "event_type",
        n.alias("n_days"),
        "s_stat",
        r6(z_num / F.sqrt(var18)).alias("z_score"),
        r6(
            F.col("s_stat").cast("double")
            / (
                F.sqrt((n0 - F.col("tie_pairs") / 2).cast("double"))
                * F.sqrt(n0.cast("double"))
            )
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# r_runs_test — Wald–Wolfowitz runs test on the daily series


@register(
    "r_runs_test",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '{_OLS_EPOCH}', CAST(ts AS DATE)) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, c AS med_c FROM (
            SELECT event_type, c,
                   row_number() OVER (PARTITION BY event_type ORDER BY c, d) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM daily
        ) WHERE rn = (n + 1) // 2
    ),
    signs AS (
        SELECT daily.event_type, daily.d,
               CAST(CASE WHEN daily.c > med.med_c THEN 1 ELSE 0 END AS BIGINT) AS s
        FROM daily JOIN med ON daily.event_type = med.event_type
    ),
    runs AS (
        SELECT event_type, s,
               CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY d) IS NULL
                     OR lag(s) OVER (PARTITION BY event_type ORDER BY d) <> s
                    THEN 1 ELSE 0 END AS boundary
        FROM signs
    ),
    agg AS (
        SELECT event_type,
               CAST(sum(boundary) AS BIGINT) AS r_runs,
               CAST(sum(s) AS BIGINT) AS n1,
               CAST(sum(1 - s) AS BIGINT) AS n2
        FROM runs GROUP BY event_type
    )
    SELECT event_type, r_runs, n1, n2,
           {r6_sql('(CAST(r_runs AS DOUBLE)'
                   ' - (2.0 * n1 * n2 / (n1 + n2) + 1.0))'
                   ' / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)'
                   '        / (CAST((n1 + n2) * (n1 + n2) AS DOUBLE) * (n1 + n2 - 1)))')} AS z_score
    FROM agg
    WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    """,
)
def r_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for serial randomness of the daily
    spend series per event type: days split into above/at-or-below the
    discrete median (the rank-⌈n/2⌉ value with a (value, day)
    tie-break — a deterministic threshold both engines cut
    identically), R counts maximal same-sign runs in day order, and
    the z-score compares R to its randomness expectation
    μ = 2n₁n₂/(n₁+n₂) + 1 — too FEW runs means trending/clustering,
    too many means oscillation.  The serial-independence sibling of
    `r_mann_kendall`'s monotonic-trend screen and
    `r_autocorrelation`'s linear lag view.

    Determinism: the run count is a lag-window boundary sum over the
    bounded daily frame; R, n₁, n₂ are exact BIGINTs; only the final
    closed-form z is a double, written identically in both engines.

    Scale shape: the corpus collapses to the |types|×|days| daily
    frame first; median, signs, and run boundaries are windows
    partitioned by event_type over that bounded frame.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit(_OLS_EPOCH).cast("date")).alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("c")
    )
    w_rank = Window.partitionBy("event_type").orderBy("c", "d")
    w_n = Window.partitionBy("event_type")
    med = (
        daily.select(
            "event_type",
            "c",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("c").alias("med_c"))
    )
    signs = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "d",
        F.when(F.col("c") > F.col("med_c"), F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("s"),
    )
    w_day = Window.partitionBy("event_type").orderBy("d")
    runs = signs.select(
        "event_type",
        "s",
        F.when(
            F.lag("s").over(w_day).isNull() | (F.lag("s").over(w_day) != F.col("s")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("boundary"),
    )
    agg = runs.groupBy("event_type").agg(
        F.sum("boundary").cast("bigint").alias("r_runs"),
        F.sum("s").cast("bigint").alias("n1"),
        F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + F.lit(1.0)
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / (((n1 + n2) * (n1 + n2)).cast("double") * (n1 + n2 - 1))
    )
    return agg.filter((n1 > 0) & (n2 > 0) & (n1 + n2 > 1)).select(
        "event_type",
        "r_runs",
        "n1",
        "n2",
        r6((F.col("r_runs").cast("double") - mu) / F.sqrt(var)).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# r_kendall_tau

KENDALL_Y_BUCKETS = 10


@register(
    "r_kendall_tau",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               CAST(hour(ts) AS BIGINT) AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
               event_id
        FROM events
    ),
    bucketed AS (
        SELECT event_type, x,
               ({KENDALL_Y_BUCKETS} * (row_number() OVER
                    (PARTITION BY event_type ORDER BY vc, event_id) - 1))
                   // (count(*) OVER (PARTITION BY event_type)) AS y
        FROM src
    ),
    cells AS (
        SELECT event_type, x, y, CAST(count(*) AS BIGINT) AS m
        FROM bucketed GROUP BY 1, 2, 3
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(COALESCE(sum(CASE WHEN b.x > a.x AND b.y > a.y
                                      THEN a.m * b.m END), 0) AS BIGINT) AS nc,
               CAST(COALESCE(sum(CASE WHEN b.x > a.x AND b.y < a.y
                                      THEN a.m * b.m END), 0) AS BIGINT) AS nd
        FROM cells a JOIN cells b ON a.event_type = b.event_type
        GROUP BY 1
    ),
    tots AS (SELECT event_type, CAST(sum(m) AS BIGINT) AS n FROM cells GROUP BY 1),
    txs AS (
        SELECT event_type, CAST(sum(rm * (rm - 1) // 2) AS BIGINT) AS tx
        FROM (SELECT event_type, x, sum(m) AS rm FROM cells GROUP BY 1, 2) r
        GROUP BY 1
    ),
    tys AS (
        SELECT event_type, CAST(sum(cm * (cm - 1) // 2) AS BIGINT) AS ty
        FROM (SELECT event_type, y, sum(m) AS cm FROM cells GROUP BY 1, 2) c
        GROUP BY 1
    )
    SELECT p.event_type, n, nc, nd, tx, ty,
           {r6_sql('CAST(nc - nd AS DOUBLE) / (sqrt(CAST(n * (n - 1) // 2 - tx AS DOUBLE)) * sqrt(CAST(n * (n - 1) // 2 - ty AS DOUBLE)))')} AS tau_b
    FROM pairs p
    JOIN tots USING (event_type)
    JOIN txs USING (event_type)
    JOIN tys USING (event_type)
    WHERE n * (n - 1) // 2 - tx > 0 AND n * (n - 1) // 2 - ty > 0
    """,
)
def r_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank correlation tau-b per event type between hour-of-day
    and the value's exact within-type decile — the third member of the
    rank-association family (Pearson in r_stats_agg, Spearman rho in
    r_spearman_corr; tau's pairwise-concordance form is the one robust
    to monotone transforms AND interpretable as a probability).  Both
    margins are BOUNDED (24 hours x {KENDALL_Y_BUCKETS} deciles), so
    concordant/discordant pairs come EXACTLY off the contingency grid:
    C = sum over cell pairs (a, b) with b.x > a.x, b.y > a.y of
    m_a * m_b, D likewise with b.y < a.y, and the tie terms come from
    the row/column margins — never an observation-pair join.

    Determinism: deciles are (K * (row_number - 1)) DIV n on the exact
    (vc, event_id) order — integer on both engines; C/D/tie counts are
    exact BIGINTs (nc <= n^2/2: int64-safe through ~3e9 rows per
    type); the single double step is the final ratio whose sqrt is
    IEEE-correctly-rounded on both sides (the r_runs_test contract).

    Scale shape: the corpus collapses in ONE exchange (the decile
    window's event_type partitioning also satisfies the cell groupBy —
    grouping keys are a superset); everything after operates on the
    <= 240-cell-per-type frame: a broadcast self-join over cell pairs
    and three margin rollups, all bounded by |types| * 240 rows."""
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
        "event_id",
    )
    # (the decile window lives in the F.expr below — SQL text is the one
    # source shared with the oracle)
    bucketed = src.select(
        "event_type",
        "x",
        F.expr(
            f"({KENDALL_Y_BUCKETS} * (row_number() OVER "
            f"(PARTITION BY event_type ORDER BY vc, event_id) - 1)) DIV "
            f"(count(*) OVER (PARTITION BY event_type))"
        ).alias("y"),
    )
    cells = (
        bucketed.groupBy("event_type", "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .persist()
    )
    a = cells.select("event_type", F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("m").alias("am"))
    b = cells.select("event_type", F.col("x").alias("bx"), F.col("y").alias("by"), F.col("m").alias("bm"))
    pairs = (
        a.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("bx") > F.col("ax")) & (F.col("by") > F.col("ay")),
                        F.col("am") * F.col("bm"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("nc"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("bx") > F.col("ax")) & (F.col("by") < F.col("ay")),
                        F.col("am") * F.col("bm"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("nd"),
        )
    )
    tots = cells.groupBy("event_type").agg(F.sum("m").cast("bigint").alias("n"))
    txs = (
        cells.groupBy("event_type", "x")
        .agg(F.sum("m").alias("rm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("rm * (rm - 1) DIV 2")).cast("bigint").alias("tx"))
    )
    tys = (
        cells.groupBy("event_type", "y")
        .agg(F.sum("m").alias("cm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("cm * (cm - 1) DIV 2")).cast("bigint").alias("ty"))
    )
    n0 = F.expr("n * (n - 1) DIV 2")
    return (
        pairs.join(tots, "event_type")
        .join(txs, "event_type")
        .join(tys, "event_type")
        .filter((n0 - F.col("tx") > 0) & (n0 - F.col("ty") > 0))
        .select(
            "event_type",
            "n",
            "nc",
            "nd",
            "tx",
            "ty",
            r6(
                (F.col("nc") - F.col("nd")).cast("double")
                / (
                    F.sqrt((n0 - F.col("tx")).cast("double"))
                    * F.sqrt((n0 - F.col("ty")).cast("double"))
                )
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# r_conversion_wilson_ci

_WILSON_Z = "1.96"      # 95% two-sided normal quantile, shared literal
_WILSON_ZZ = "3.8416"   # z^2, shared DECIMAL literal (identical parse on
                        # both engines — never computed as z*z at runtime)
WILSON_SUCCESS_CENTS = 5000


@register(
    "r_conversion_wilson_ci",
    oracle=f"""
    WITH agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN floor(value * 100 + 0.5) >= {WILSON_SUCCESS_CENTS}
                                THEN 1 END) AS BIGINT) AS successes
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, successes,
           {r6_sql('CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)')} AS p_hat,
           {r6_sql(f'((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) + {_WILSON_ZZ} / (2.0 * CAST(n AS DOUBLE)) - {_WILSON_Z} * sqrt((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + {_WILSON_ZZ} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / (1.0 + {_WILSON_ZZ} / CAST(n AS DOUBLE))')} AS wilson_lo,
           {r6_sql(f'((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) + {_WILSON_ZZ} / (2.0 * CAST(n AS DOUBLE)) + {_WILSON_Z} * sqrt((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + {_WILSON_ZZ} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / (1.0 + {_WILSON_ZZ} / CAST(n AS DOUBLE))')} AS wilson_hi
    FROM agg
    """,
)
def r_conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval (95%) on a per-type success rate — the
    uncertainty-aware conversion metric every experimentation dashboard
    puts beside the point estimate (and what ClickHouse users build
    from countIf/avg by hand).  Success = event value >= {WILSON_SUCCESS_CENTS}
    cents; the interval is the Wilson form, which stays inside [0, 1]
    and behaves at small n where the Wald interval collapses.

    Determinism: n and successes are exact BIGINTs; p̂ and the interval
    are ONE double expression per output column built from +, −, ×, ÷
    and sqrt — all IEEE-correctly-rounded operations — in identical
    operand order on both engines, with z and z² as shared DECIMAL
    LITERALS (never computed), so the doubles agree bit-for-bit before
    the shared 6-dp rounding.  This is the boundary of the exactness
    policy: algebraic ops + sqrt are portable; transcendentals (erf,
    ln) are not and stay out (the geo/entropy rule).

    Scale shape: one map-side-combined aggregation to |event_types|
    rows; the interval math runs on the tiny aggregate frame."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(
            F.when(
                F.floor(F.col("value") * 100 + F.lit(0.5)) >= WILSON_SUCCESS_CENTS,
                F.lit(1),
            )
        )
        .cast("bigint")
        .alias("successes"),
    )
    p = F.expr("CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)")
    nd = F.expr("CAST(n AS DOUBLE)")
    zz = F.expr(_WILSON_ZZ)
    z = F.expr(_WILSON_Z)
    half = z * F.sqrt(p * (F.lit(1.0) - p) / nd + zz / (F.lit(4.0) * nd * nd))
    denom = F.lit(1.0) + zz / nd
    center_num = p + zz / (F.lit(2.0) * nd)
    return agg.select(
        "event_type",
        "n",
        "successes",
        r6(p).alias("p_hat"),
        r6((center_num - half) / denom).alias("wilson_lo"),
        r6((center_num + half) / denom).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# r_anova_oneway / r_levene_brown_forsythe

# Per-group sum-of-squares terms are quantized to CENTI units
# (floor-free divmod: ipart*100 + rem*100 DIV n) before the cross-group
# BIGINT sum — a double sum over even a 5-row frame is shuffle-order-
# dependent, so the quantization IS the defined semantics (the
# r_cramers_v discipline), identical on both engines and bounding the
# SS error by |groups| * 0.005.  Values center on a FIXED literal (not
# the data mean) so every divmod numerator is a positive square and
# floor-vs-trunc division can never diverge.
_ANOVA_CENTER = 5000  # cents; mid-range literal, shared by both engines


def _ss_centi_sql(t: str, n: str) -> str:
    """BIGINT centi-units of t^2 / n (t may be negative; t^2 is not).
    Fully parenthesized: the expression is spliced after minus signs."""
    return f"((({t} * {t}) // {n}) * 100 + ((({t} * {t}) % {n}) * 100) // {n})"


def _anova_tail_sql(stat_alias: str, extra: str = "") -> str:
    """The shared terms/tot/SELECT SS-assembly over a CTE ``m(n, t,
    sdd)`` — ONE generator for both oracles (the memory-file
    discipline), so a quantization fix can never drift between them.
    SSB is clamped at 0: the centi quantization can undershoot by up
    to |groups| quanta when group means are near-identical, and a
    negative sum of squares must never escape (review r13)."""
    ssb = f"GREATEST(CAST(sb0 - {_ss_centi_sql('tt', 'nn')} AS BIGINT), 0)"
    return f"""
    terms AS (
        SELECT n, t,
               {_ss_centi_sql('t', 'n')} AS bterm_centi,
               sdd * 100 - {_ss_centi_sql('t', 'n')} AS wterm_centi
        FROM m WHERE n >= 2
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(t) AS BIGINT) AS tt,
               CAST(sum(bterm_centi) AS BIGINT) AS sb0,
               CAST(sum(wterm_centi) AS BIGINT) AS ssw_centi
        FROM terms
    )
    SELECT k, nn AS n,
           {ssb} AS ssb_centi,
           ssw_centi,
           {r6_sql(f'(CAST({ssb} AS DOUBLE) / (k - 1)) / (CAST(ssw_centi AS DOUBLE) / (nn - k))')} AS {stat_alias}{extra}
    FROM tot
    WHERE k >= 2 AND nn > k AND ssw_centi > 0
    """


def _ss_centi_expr(t: str, n: str) -> "F.Column":
    """Spark twin of _ss_centi_sql (DIV for the exact-integer token)."""
    return F.expr(
        f"((({t} * {t}) DIV {n}) * 100 + ((({t} * {t}) % {n}) * 100) DIV {n})"
    )


def _anova_tail(m: DataFrame, stat_alias: str, with_eta: bool) -> DataFrame:
    """Spark twin of _anova_tail_sql over a frame m(n, t, sdd)."""
    terms = m.filter(F.col("n") >= 2).select(
        "n",
        "t",
        _ss_centi_expr("t", "n").alias("bterm_centi"),
        (F.col("sdd") * 100 - _ss_centi_expr("t", "n")).alias("wterm_centi"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("t").cast("bigint").alias("tt"),
        F.sum("bterm_centi").cast("bigint").alias("sb0"),
        F.sum("wterm_centi").cast("bigint").alias("ssw_centi"),
    )
    ssb = F.greatest(
        (F.col("sb0") - _ss_centi_expr("tt", "nn")).cast("bigint"), F.lit(0)
    )
    cols = [
        "k",
        F.col("nn").alias("n"),
        ssb.alias("ssb_centi"),
        "ssw_centi",
        r6(
            (ssb.cast("double") / (F.col("k") - 1))
            / (F.col("ssw_centi").cast("double") / (F.col("nn") - F.col("k")))
        ).alias(stat_alias),
    ]
    if with_eta:
        cols.append(
            r6(
                ssb.cast("double")
                / (ssb.cast("double") + F.col("ssw_centi").cast("double"))
            ).alias("eta_squared")
        )
    return tot.filter(
        (F.col("k") >= 2) & (F.col("nn") > F.col("k")) & (F.col("ssw_centi") > 0)
    ).select(*cols)


# eta^2 column spliced into the shared tail (clamped SSB on both sides)
_ANOVA_SSB = (
    "GREATEST(CAST(sb0 - " + _ss_centi_sql("tt", "nn") + " AS BIGINT), 0)"
)
_ANOVA_ETA_EXTRA = (
    ",\n           "
    + r6_sql(
        "CAST(" + _ANOVA_SSB + " AS DOUBLE) / (CAST(" + _ANOVA_SSB
        + " AS DOUBLE) + CAST(ssw_centi AS DOUBLE))"
    )
    + " AS eta_squared"
)


@register(
    "r_anova_oneway",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) - {_ANOVA_CENTER}) AS BIGINT) AS t,
               CAST(sum((CAST(floor(value * 100 + 0.5) AS BIGINT) - {_ANOVA_CENTER})
                        * (CAST(floor(value * 100 + 0.5) AS BIGINT) - {_ANOVA_CENTER})) AS BIGINT) AS sdd
        FROM events GROUP BY event_type
    ),
    {_anova_tail_sql('f_stat', _ANOVA_ETA_EXTRA)}
    """,
)
def r_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types on the event value (BIGINT
    cents): between/within sums of squares, the F statistic, and
    eta-squared effect size — the k-group generalization of
    r_welch_ttest's pairwise screen.

    Exactness: per-group sufficient statistics (n, Σd, Σd² around the
    FIXED {_ANOVA_CENTER}-cent center) reduce in one map-side-combined
    pass as exact BIGINTs; SSB = Σ Tᵢ²/nᵢ − T²/N and SSW = Σdᵢ² −
    Tᵢ²/nᵢ are assembled from CENTI-quantized integer terms (see
    module note), so no cross-row double sum exists anywhere; F and η²
    are single double ratios of those integers.

    Int64 headroom (the r_welch_ttest note, tightened by the squaring
    of group sums): Tᵢ² ≤ (nᵢ·C)² with C = max |cents − {_ANOVA_CENTER}|
    ≈ 5·10³ stays inside 2⁶³ up to nᵢ ≈ 6·10⁵ rows per group; past
    that, pre-aggregate per (group, day) first (the r_lttb daily
    compression) or widen the center pass — documented, not silent.

    Scale shape: ONE map-side-combined aggregation to |event_types|
    rows; everything after runs on that bounded frame (a 1-row total
    via a second tiny aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") - F.lit(
        _ANOVA_CENTER
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d).cast("bigint").alias("t"),
        F.sum(d * d).cast("bigint").alias("sdd"),
    )
    return _anova_tail(m, "f_stat", with_eta=True)


_BF_CENTER = 10000  # half-cent units; |2*vc - med2| mid-range literal


@register(
    "r_levene_brown_forsythe",
    oracle=f"""
    WITH src AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        FROM events
    ),
    ranked AS (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM src
    ),
    med AS (
        SELECT event_type,
               CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN vc END)
                    + sum(CASE WHEN rn = (n + 2) // 2 THEN vc END) AS BIGINT) AS med2
        FROM ranked GROUP BY event_type
    ),
    z AS (
        SELECT s.event_type,
               abs(2 * s.vc - med.med2) - {_BF_CENTER} AS d
        FROM src s JOIN med ON med.event_type = s.event_type
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d) AS BIGINT) AS t,
               CAST(sum(d * d) AS BIGINT) AS sdd
        FROM z GROUP BY event_type
    ),
    {_anova_tail_sql('w_stat')}
    """,
)
def r_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene's test with MEDIAN centers) for
    equality of variances across event types — the robust
    variance-homogeneity screen run before trusting r_anova_oneway's
    pooled-variance F (scipy's ``levene(center='median')``).  Each
    value maps to its absolute deviation from the group MEDIAN, then
    the one-way ANOVA F of those deviations is the W statistic.

    Exactness: the group median is rank-exact (sum of the two middle
    order statistics, so z = |2·vc − med2| stays a half-cent BIGINT —
    no .5 ever materializes); the SS assembly is the shared
    centi-quantized integer machinery of r_anova_oneway (no cross-row
    double sums), and W is one double ratio.

    Scale shape: the rank window and BOTH aggregations share the
    event_type partitioning (one corpus exchange); the median table is
    a |types|-row broadcast back to the scan."""
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
    )
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    ranked = src.select(
        "event_type",
        "vc",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    lo = F.expr("(n + 1) DIV 2")
    hi = F.expr("(n + 2) DIV 2")
    med = ranked.groupBy("event_type").agg(
        (
            F.sum(F.when(F.col("rn") == lo, F.col("vc")))
            + F.sum(F.when(F.col("rn") == hi, F.col("vc")))
        )
        .cast("bigint")
        .alias("med2")
    )
    d = (F.abs(2 * F.col("vc") - F.col("med2")) - F.lit(_BF_CENTER)).alias("d")
    z = src.join(F.broadcast(med), "event_type").select("event_type", d)
    m = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("t"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
    )
    return _anova_tail(m, "w_stat", with_eta=False)


# ---------------------------------------------------------------------------
# r_cuped_variance_reduction

_CUPED_SPLIT = "2024-01-16"  # pre-period = days before this literal


@register(
    "r_cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(COALESCE(sum(CASE WHEN CAST(ts AS DATE) < DATE '{_CUPED_SPLIT}'
                        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS x,
               CAST(COALESCE(sum(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_SPLIT}'
                        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM per_user
    )
    SELECT n, sx, sy,
           {r6_sql('(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)')} AS theta,
           {r6_sql('(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * n)')} AS var_post,
           {r6_sql('((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))')} AS rho_squared,
           {r6_sql('1.0 - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))')} AS var_reduction_ratio
    FROM m
    WHERE n >= 2
      AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
    """,
)
def r_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) readout
    — the variance-reduction computation every experimentation platform
    runs before an A/B test: per user, pre-period spend (before
    {_CUPED_SPLIT}) is the covariate x and experiment-period spend the
    metric y; theta = cov(x, y)/var(x) is the adjustment coefficient
    and the adjusted metric's variance shrinks by exactly rho^2, the
    squared pre/post correlation (var_reduction_ratio = 1 - rho^2 is
    what remains).

    Exactness: per-user x/y are exact BIGINT cents from one map-side-
    combined pass; the five moments (Σx, Σy, Σx², Σxy, Σy²) reduce as
    exact BIGINTs (x, y ≤ ~10⁶ cents keeps Σx² inside 2⁶³ to ~10⁹
    users); theta / var / rho² are single double expressions over
    those integers on a 1-row frame — no cross-row float sums (the
    n·Σxy − Σx·Σy forms evaluate in DOUBLE because (Σx)² alone would
    overflow int64, and identical operand order keeps both engines
    bit-equal before rounding).

    Int64 headroom (corrected r13 review): Σx² ≤ users·(max cents)²
    stays inside 2⁶³ only to ~9·10⁶ users at x ≤ 10⁶ cents — past
    that, pre-scale per-user sums to whole dollars (or widen to a
    per-cohort first pass) before the moment reduction, the
    r_anova_oneway prescription; documented, not silent.

    Scale shape: one user-keyed aggregation (map-side combined), one
    1-row moment rollup — two exchanges total, both combiner-friendly."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    split = F.lit(_CUPED_SPLIT).cast("date")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts").cast("date") < split, cents)), F.lit(0))
        .cast("bigint")
        .alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts").cast("date") >= split, cents)), F.lit(0))
        .cast("bigint")
        .alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    rho2 = (cov_n * cov_n) / (varx_n * vary_n)
    return (
        m.filter((F.col("n") >= 2) & (varx_n > 0) & (vary_n > 0))
        .select(
            "n",
            "sx",
            "sy",
            r6(cov_n / varx_n).alias("theta"),
            r6(vary_n / (nd * F.col("n"))).alias("var_post"),
            r6(rho2).alias("rho_squared"),
            r6(F.lit(1.0) - rho2).alias("var_reduction_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# r_kruskal_wallis

# The H statistic in the centered-rank form: with doubled ranks
# r2 = 2*rank + t_eq - 1 (exact BIGINT through .5 tie averages, the
# r_mann_whitney device) and c = r2 - (N+1) (centered: E[r2] = N+1
# exactly), the textbook H = 12/(N(N+1)) * SUM S_i^2/n_i - 3(N+1)
# collapses to H = 3 * SUM C_i^2/n_i / (N(N+1)) because SUM C_i = 0 —
# one fewer cross-group term and every numerator is a positive square,
# so the ANOVA centi-divmod quantization applies verbatim.
_KW_H_SQL = (
    "CAST(3 * sq AS DOUBLE) / CAST(100 * nn * (nn + 1) AS DOUBLE)"
)
_KW_CORR_SQL = (
    f"({_KW_H_SQL})"
    " * (CAST(nn * nn * nn - nn AS DOUBLE)"
    " / CAST(nn * nn * nn - nn - tie3 AS DOUBLE))"
)

# Int64 headroom guards, ENFORCED in the plan (ADVICE r14 — the bound
# was documented but unenforced; past it Spark silently wraps the
# BIGINT square while DuckDB errors, a data-dependent parity break).
# Applied as a WHERE conjunct in BOTH engines (the r_power_analysis
# mean-floor convention), ordered FIRST so the cubic tie term is never
# evaluated on an oversize N: an over-headroom event type drops from
# the readout instead of carrying a wrapped statistic.
_KW_C_MAX = 3_037_000_499  # floor(sqrt(2^63 - 1)): C_i^2 must not wrap
_KW_N_MAX = 2_097_151      # floor(cbrt(2^63 - 1)): the N^3 tie term


@register(
    "r_kruskal_wallis",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
               CAST(((date_diff('day', DATE '{_MW_MONDAY}', CAST(ts AS DATE)) % 7) + 7) % 7 AS BIGINT) AS dow
        FROM events
    ),
    ranked AS (
        SELECT event_type, dow,
               CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY vc)
                    + count(*) OVER (PARTITION BY event_type, vc) - 1 AS BIGINT) AS r2,
               CAST(count(*) OVER (PARTITION BY event_type, vc) AS BIGINT) AS teq,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
        FROM src
    ),
    grp AS (
        SELECT event_type, dow,
               CAST(count(*) AS BIGINT) AS n_i,
               CAST(sum(r2 - (nn + 1)) AS BIGINT) AS c_i,
               CAST(max(nn) AS BIGINT) AS nn,
               CAST(sum(teq * teq - 1) AS BIGINT) AS tie3_part
        FROM ranked
        WHERE nn <= {_KW_N_MAX}
        GROUP BY event_type, dow
    ),
    guarded AS (
        SELECT * FROM (
            SELECT g.*,
                   max(abs(c_i)) OVER (PARTITION BY event_type) AS max_abs_c
            FROM grp g
        )
        WHERE max_abs_c <= {_KW_C_MAX}
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS k,
               CAST(max(nn) AS BIGINT) AS nn,
               CAST(sum({_ss_centi_sql('c_i', 'n_i')}) AS BIGINT) AS sq,
               CAST(sum(tie3_part) AS BIGINT) AS tie3
        FROM guarded GROUP BY event_type
    )
    SELECT event_type, nn AS n, k, tie3,
           {r6_sql(_KW_H_SQL)} AS h_stat,
           {r6_sql(_KW_CORR_SQL)} AS h_corrected,
           {r6_sql(f'(({_KW_CORR_SQL}) - CAST(k - 1 AS DOUBLE)) / CAST(nn - k AS DOUBLE)')} AS epsilon_sq
    FROM m
    WHERE k >= 2 AND nn > k AND nn * nn * nn - nn - tie3 > 0
    ORDER BY event_type
    """,
)
def r_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis one-way rank test (the ClickHouse
    `kruskalWallisTest` analog) per event type: do event values differ
    across day-of-week groups?  The k-group generalization of
    r_mann_whitney and the nonparametric sibling of r_anova_oneway —
    the drift screen a data warehouse runs when value distributions
    are too heavy-tailed to trust the F test.  Reports H, the
    tie-corrected H, and the epsilon-squared effect size.

    Determinism: doubled ranks r2 = 2*rank + t_eq - 1 are exact
    BIGINTs (r_mann_whitney); centered ranks c = r2 - (N+1) make every
    group term a positive square, so the per-group C_i^2/n_i terms
    reduce with the ANOVA centi-divmod quantization (no cross-row
    double sum anywhere) and H = 3*SUM/(N(N+1)) is a single double
    ratio of exact integers.  Ties fold in per-row as SUM(t_eq^2 - 1)
    = SUM(t^3 - t), the Mann-Whitney device.  Day-of-week is integer
    arithmetic from the shared Monday anchor, never engine dayofweek.

    Int64 headroom (self-review r14 — the first-draft bound was ~10x
    optimistic): with balanced groups n_i = N/7, the worst case
    |C_i| <= n_i * 2N = 2N^2/7, and C_i^2 <= 2^63 therefore requires
    N <~ 1e5 rows per event type; the tie-correction N^3 term allows
    ~2e6, so the square is the binding bound. Past ~1e5, pre-bucket
    values to a bounded histogram and rank bucket boundaries (the
    r_percentile_disc trade) — the realistic |C_i| is far smaller
    (centered ranks cancel within balanced groups). The contract is
    ENFORCED, not just documented (ADVICE r14): both engines filter
    max|C_i| <= floor(sqrt(2^63-1)) and N <= floor(cbrt(2^63-1))
    BEFORE the square, so an over-headroom type drops from the
    readout identically on both sides instead of Spark wrapping
    where DuckDB errors.

    Scale shape: one rank window partitioned by event_type (never
    global), one map-side-combined rollup to |event_types| x 7 rows,
    then a second tiny rollup to |event_types| rows."""
    ev = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    dow = (
        (F.datediff(F.col("ts").cast("date"), F.lit(_MW_MONDAY).cast("date")) % 7) + 7
    ) % 7
    src = ev.select(
        "event_type", vc.alias("vc"), dow.cast("bigint").alias("dow")
    )
    w_rank = Window.partitionBy("event_type").orderBy("vc")
    w_eq = Window.partitionBy("event_type", "vc")
    w_all = Window.partitionBy("event_type")
    ranked = src.select(
        "event_type",
        "dow",
        (
            2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_eq) - 1
        ).cast("bigint").alias("r2"),
        F.count(F.lit(1)).over(w_eq).cast("bigint").alias("teq"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("nn"),
    )
    # nn cap BEFORE the grouped products (self-review r15): with the cap
    # enforced here, sum(teq^2) <= nn^3 < 2^63 and |c_i| <= 2*nn^2 < 2^44
    # can't wrap inside grp on either engine; without it DuckDB would
    # overflow-ERROR inside the grp aggregation while Spark wrapped —
    # the guard must precede the arithmetic it guards, as with the
    # square below
    grp = ranked.filter(F.col("nn") <= _KW_N_MAX).groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(F.col("r2") - (F.col("nn") + 1)).cast("bigint").alias("c_i"),
        F.max("nn").cast("bigint").alias("nn"),
        F.sum(F.col("teq") * F.col("teq") - 1).cast("bigint").alias("tie3_part"),
    )
    # headroom guard BEFORE the square (ADVICE r14): an over-headroom
    # event type drops loudly instead of wrapping C_i^2 in int64; the
    # window reuses grp's event_type partitioning (no extra exchange)
    w_type = Window.partitionBy("event_type")
    grp = grp.withColumn("max_abs_c", F.max(F.abs(F.col("c_i"))).over(w_type)).filter(
        F.col("max_abs_c") <= _KW_C_MAX
    )
    m = grp.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("nn").cast("bigint").alias("nn"),
        F.sum(_ss_centi_expr("c_i", "n_i")).cast("bigint").alias("sq"),
        F.sum("tie3_part").cast("bigint").alias("tie3"),
    )
    h = F.expr(_KW_H_SQL)
    h_corr = F.expr(_KW_CORR_SQL)
    return (
        m.filter(
            (F.col("k") >= 2)
            & (F.col("nn") > F.col("k"))
            & (F.col("nn") * F.col("nn") * F.col("nn") - F.col("nn") - F.col("tie3") > 0)
        )
        .select(
            "event_type",
            F.col("nn").alias("n"),
            "k",
            "tie3",
            r6(h).alias("h_stat"),
            r6(h_corr).alias("h_corrected"),
            r6(
                (h_corr - (F.col("k") - 1).cast("double"))
                / (F.col("nn") - F.col("k")).cast("double")
            ).alias("epsilon_sq"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# r_benjamini_hochberg

# Distribution-free per-hypothesis p-value: the two-sided Chebyshev
# bound p = min(1, 1/z^2) with z^2 = n_h * diff^2 / s^2.  Chebyshev
# keeps the whole pipeline inside exact-integer ratios + three IEEE
# double ops (no normal CDF, which is transcendental and NOT
# reproducible across engines) — conservative but a real p-value, and
# the BH step-up procedure downstream is the operator under test.
_BH_ALPHA = "0.05"
_BH_Z2_SQL = (
    "((CAST(t_h AS DOUBLE) / CAST(n_h AS DOUBLE)"
    " - CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE))"
    " * (CAST(t_h AS DOUBLE) / CAST(n_h AS DOUBLE)"
    " - CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE)))"
    " * CAST(n_h AS DOUBLE)"
    " / (CAST(var_centi AS DOUBLE) / CAST(100 * (nn - 1) AS DOUBLE))"
)
_BH_P_SQL = f"CASE WHEN ({_BH_Z2_SQL}) > 1.0 THEN 1.0 / ({_BH_Z2_SQL}) ELSE 1.0 END"


@register(
    "r_benjamini_hochberg",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               CAST(hour(ts) AS BIGINT) AS hr,
               CAST(floor(value * 100 + 0.5) AS BIGINT) - {_ANOVA_CENTER} AS d
        FROM events
    ),
    cell AS (
        SELECT event_type, hr,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(d) AS BIGINT) AS t_h
        FROM src GROUP BY event_type, hr
    ),
    fam AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(d) AS BIGINT) AS tt,
               CAST(sum(d * d) AS BIGINT) AS sdd
        FROM src GROUP BY event_type
    ),
    joined AS (
        SELECT c.event_type, c.hr, c.n_h, c.t_h, f.nn, f.tt,
               CAST(f.sdd * 100 - {_ss_centi_sql('f.tt', 'f.nn')} AS BIGINT) AS var_centi
        FROM cell c JOIN fam f ON c.event_type = f.event_type
        WHERE f.nn >= 2 AND c.n_h >= 2
    ),
    pvals AS (
        SELECT event_type, hr, n_h,
               {_BH_P_SQL} AS p
        FROM joined
        WHERE var_centi > 0
    ),
    bh AS (
        SELECT event_type, hr, n_h, p,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY p, hr) AS BIGINT) AS i,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
        FROM pvals
    ),
    verdict AS (
        SELECT event_type, hr, n_h, p, i, m,
               CAST(max(CASE WHEN p <= CAST(i AS DOUBLE) * {_BH_ALPHA} / CAST(m AS DOUBLE)
                             THEN i ELSE 0 END)
                    OVER (PARTITION BY event_type) AS BIGINT) AS k_max
        FROM bh
    )
    SELECT event_type, CAST(hr AS INT) AS hr, n_h,
           {r6_sql('p')} AS p_cheb,
           i AS p_rank, m AS n_tests,
           {r6_sql(f'CAST(i AS DOUBLE) * {_BH_ALPHA} / CAST(m AS DOUBLE)')} AS bh_threshold,
           CAST(CASE WHEN i <= k_max THEN 1 ELSE 0 END AS INT) AS rejected
    FROM verdict
    ORDER BY event_type, p_rank
    """,
)
def r_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over per-hour mean-shift
    tests within each event type — the multiple-testing correction an
    experimentation warehouse applies before alerting on "hour 14
    spends more" style findings (24 hypotheses per family, expected
    false-positive floor without control).  For each family: rank the
    per-hour p-values ascending, find the largest i with
    p_(i) <= i*alpha/m (alpha = {_BH_ALPHA}), reject hypotheses 1..i.

    Determinism: the per-hypothesis p is the two-sided Chebyshev bound
    min(1, 1/z^2) — z^2 = n_h*(mean_h - mean)^2/s^2 assembled from
    exact BIGINT sufficient statistics (cents around the shared ANOVA
    center; family variance via the centi-divmod quantization), so p
    is a handful of IEEE double ops written identically in both
    engines; the BH comparisons and the (p, hour) rank order then
    agree bit-for-bit.  Conservative by construction (Chebyshev vs
    normal), which only strengthens the FDR guarantee.

    Scale shape: two map-side-combined aggregations over the same
    scan (per-cell and per-family sufficient stats), a broadcast-size
    join (|event_types| rows), and windows over bounded 24-row
    families — no global window, no per-row state."""
    ev = load_table(spark, sf_dir, "events")
    d = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") - F.lit(
        _ANOVA_CENTER
    )
    src = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hr"),
        d.alias("d"),
    )
    cell = src.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("d").cast("bigint").alias("t_h"),
    )
    fam = src.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("d").cast("bigint").alias("tt"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
    )
    joined = (
        cell.join(F.broadcast(fam), "event_type")
        .filter((F.col("nn") >= 2) & (F.col("n_h") >= 2))
        .withColumn(
            "var_centi",
            (F.col("sdd") * 100 - _ss_centi_expr("tt", "nn")).cast("bigint"),
        )
        .filter(F.col("var_centi") > 0)
    )
    pvals = joined.select(
        "event_type", "hr", "n_h", F.expr(_BH_P_SQL).alias("p")
    )
    w_fam = Window.partitionBy("event_type")
    bh = pvals.select(
        "event_type",
        "hr",
        "n_h",
        "p",
        F.row_number()
        .over(w_fam.orderBy("p", "hr"))
        .cast("bigint")
        .alias("i"),
        F.count(F.lit(1)).over(w_fam).cast("bigint").alias("m"),
    )
    thresh = F.col("i").cast("double") * F.lit(float(_BH_ALPHA)) / F.col(
        "m"
    ).cast("double")
    verdict = bh.withColumn(
        "k_max",
        F.max(F.when(F.col("p") <= thresh, F.col("i")).otherwise(F.lit(0)))
        .over(w_fam)
        .cast("bigint"),
    )
    return verdict.select(
        "event_type",
        F.col("hr").cast("int").alias("hr"),
        "n_h",
        r6(F.col("p")).alias("p_cheb"),
        F.col("i").alias("p_rank"),
        F.col("m").alias("n_tests"),
        r6(thresh).alias("bh_threshold"),
        F.when(F.col("i") <= F.col("k_max"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("rejected"),
    ).orderBy("event_type", "p_rank")


# ---------------------------------------------------------------------------
# r_srm_check

# 95th-percentile chi-square critical values by degrees of freedom —
# shared literals (computed once, never per-engine): the SRM gate is
# "chi2 exceeds the df-appropriate critical value".
_SRM_BUCKETS = 4
_SRM_CRIT_DF3 = "7.814728"  # chi2_{0.95, df=3}


SRM_ORACLE_SQL = f"""
    WITH assigned AS (
        SELECT event_type,
               CAST({hash60_sql("CAST(user_id AS VARCHAR)")} % {_SRM_BUCKETS} AS BIGINT) AS bucket
        FROM events
    ),
    cells AS (
        SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS o
        FROM assigned GROUP BY event_type, bucket
    ),
    fam AS (
        SELECT event_type,
               CAST(sum(o) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum(({_SRM_BUCKETS} * o) * ({_SRM_BUCKETS} * o)) AS BIGINT) AS so2x16,
               CAST(max(o) AS BIGINT) AS o_max,
               CAST(min(o) AS BIGINT) AS o_min
        FROM cells GROUP BY event_type
    )
    SELECT event_type, n, k, o_min, o_max,
           {r6_sql(f'CAST(so2x16 - {_SRM_BUCKETS} * n * n AS DOUBLE) / CAST({_SRM_BUCKETS} * n AS DOUBLE)')} AS chi2,
           CAST(CASE WHEN CAST(so2x16 - {_SRM_BUCKETS} * n * n AS DOUBLE)
                          / CAST({_SRM_BUCKETS} * n AS DOUBLE) > {_SRM_CRIT_DF3}
                THEN 1 ELSE 0 END AS INT) AS srm_detected
    FROM fam
    WHERE k = {_SRM_BUCKETS} AND n > 0
    ORDER BY event_type
"""


def srm_bucket_cells(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, o) frame — exact per-cell counts under the
    shared md5 hash60 assignment.  Additive partials: cell counts from
    disjoint event subsets SUM to the full-table cells, which is what
    lets s_stream_srm land per-micro-batch partials and merge at serve
    time."""
    bucket = (
        hash60(F.col("user_id").cast("string")) % _SRM_BUCKETS
    ).cast("bigint")
    return (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )


def srm_present(cells: DataFrame) -> DataFrame:
    """chi-square tail over a (event_type, bucket, o) cells frame — the
    one assembly both the batch key and its streaming twin run."""
    fam = cells.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum((_SRM_BUCKETS * F.col("o")) * (_SRM_BUCKETS * F.col("o")))
        .cast("bigint")
        .alias("so2x16"),
        F.max("o").cast("bigint").alias("o_max"),
        F.min("o").cast("bigint").alias("o_min"),
    )
    chi2 = (
        F.col("so2x16") - _SRM_BUCKETS * F.col("n") * F.col("n")
    ).cast("double") / (_SRM_BUCKETS * F.col("n")).cast("double")
    return (
        fam.filter((F.col("k") == _SRM_BUCKETS) & (F.col("n") > 0))
        .select(
            "event_type",
            "n",
            "k",
            "o_min",
            "o_max",
            r6(chi2).alias("chi2"),
            F.when(chi2 > float(_SRM_CRIT_DF3), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("srm_detected"),
        )
        .orderBy("event_type")
    )


@register("r_srm_check", oracle=SRM_ORACLE_SQL)
def r_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) check per event type: users hash
    into {_SRM_BUCKETS} equal experiment buckets (the md5-based
    hash60 assignment both engines share), and the chi-square
    goodness-of-fit statistic against the uniform expectation flags
    families whose realized split deviates beyond chi2_(0.95, df=3) —
    the first gate every A/B platform runs before reading any metric,
    because a biased assignment invalidates everything downstream.

    Determinism: bucket counts are exact BIGINTs; the identity
    chi2 = (SUM((k*O_i)^2) - k*N^2) / (k*N) keeps the numerator an
    exact integer (expected count N/k never materializes as a double),
    so chi2 is ONE double division and the critical-value comparison
    is a shared 6-dp literal — no CDF evaluation anywhere.

    Int64 headroom: (k*O_i)^2 <= (4N)^2 stays inside 2^63 up to
    N ~ 7.5e8 users per family; past that, count in millions first —
    documented, not silent.

    Scale shape: ONE map-side-combined aggregation to |types| x 4
    rows, then a tiny rollup to |types| rows — raw event volume only
    touches the first pass."""
    ev = load_table(spark, sf_dir, "events")
    return srm_present(srm_bucket_cells(ev))


# ---------------------------------------------------------------------------
# r_power_analysis

# Shared normal-quantile literals (computed once, inlined — the Benford
# discipline for transcendental constants): z_{0.975} for two-sided
# alpha = 0.05, z_{0.80} for 80% power.
_PW_Z_ALPHA = "1.959964"
_PW_Z_POWER = "0.841621"
_PW_LIFT = "0.01"  # target relative lift for the sample-size column

_PW_S2_SQL = "CAST(var_centi AS DOUBLE) / CAST(100 * (nn - 1) AS DOUBLE)"
_PW_MEAN_SQL = f"CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE) + {_ANOVA_CENTER}"
_PW_MDE_SQL = (
    f"({_PW_Z_ALPHA} + {_PW_Z_POWER})"
    f" * sqrt(4.0 * ({_PW_S2_SQL}) / CAST(nn AS DOUBLE))"
)
_PW_NREQ_SQL = (
    f"ceil(4.0 * ({_PW_Z_ALPHA} + {_PW_Z_POWER}) * ({_PW_Z_ALPHA} + {_PW_Z_POWER})"
    f" * ({_PW_S2_SQL})"
    f" / (({_PW_LIFT} * ({_PW_MEAN_SQL})) * ({_PW_LIFT} * ({_PW_MEAN_SQL}))))"
)


@register(
    "r_power_analysis",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) - {_ANOVA_CENTER} AS d
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(d) AS BIGINT) AS tt,
               CAST(sum(d * d) AS BIGINT) AS sdd
        FROM src GROUP BY event_type
    ),
    v AS (
        SELECT event_type, nn, tt,
               CAST(sdd * 100 - {_ss_centi_sql('tt', 'nn')} AS BIGINT) AS var_centi
        FROM m WHERE nn >= 2
    )
    SELECT event_type, nn AS n,
           {r6_sql(_PW_S2_SQL)} AS s2_cents,
           {r6_sql(_PW_MEAN_SQL)} AS mean_cents,
           {r6_sql(_PW_MDE_SQL)} AS mde_cents,
           CAST({_PW_NREQ_SQL} AS BIGINT) AS n_required_1pct
    FROM v
    WHERE var_centi > 0 AND tt + nn * {_ANOVA_CENTER} >= nn
    ORDER BY event_type
    """,
)
def r_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis per event type — the planning half of the
    experimentation family (r_welch_ttest / r_conversion_wilson_ci /
    r_cuped_variance_reduction / r_srm_check measure; this key sizes):
    from the observed value variance, (1) the minimal detectable
    effect in cents at 80% power / two-sided alpha = 0.05 if today's
    traffic split 50/50, MDE = (z_a + z_b) * sqrt(4 s^2 / N), and
    (2) the TOTAL sample size needed to detect a 1% lift of the
    current mean, N = 4 (z_a + z_b)^2 s^2 / (0.01 mu)^2.

    Determinism: sufficient statistics are the exact BIGINT ANOVA-
    centered sums; the variance uses the centi-divmod quantization, so
    s^2 and the mean are single double ratios of exact integers; the
    normal quantiles are SHARED 6-dp literals (never a per-engine
    quantile evaluation), sqrt is IEEE-correctly-rounded, and ceil of
    an identically-computed double agrees bit-for-bit.

    Scale shape: ONE map-side-combined aggregation to |event_types|
    rows; everything downstream is row-local arithmetic on that
    bounded frame."""
    ev = load_table(spark, sf_dir, "events")
    d = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") - F.lit(
        _ANOVA_CENTER
    )
    m = ev.select("event_type", d.alias("d")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("d").cast("bigint").alias("tt"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
    )
    v = m.filter(F.col("nn") >= 2).withColumn(
        "var_centi",
        (F.col("sdd") * 100 - _ss_centi_expr("tt", "nn")).cast("bigint"),
    )
    return (
        v.filter(
            (F.col("var_centi") > 0)
            # mean >= 1 cent (not just > 0): n_required scales as
            # 1/mean^2, and a near-zero mean pushes the ceil past
            # 2^63 where DuckDB CAST errors but Spark's cast NULLs —
            # a data-dependent parity break (review r14). Below one
            # cent the "1% of the mean" target is meaningless anyway.
            & (F.col("tt") + F.col("nn") * _ANOVA_CENTER >= F.col("nn"))
        )
        .select(
            "event_type",
            F.col("nn").alias("n"),
            r6(F.expr(_PW_S2_SQL)).alias("s2_cents"),
            r6(F.expr(_PW_MEAN_SQL)).alias("mean_cents"),
            r6(F.expr(_PW_MDE_SQL)).alias("mde_cents"),
            F.expr(_PW_NREQ_SQL).cast("bigint").alias("n_required_1pct"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# r_did_estimator

# Four (treat, post) cells pivoted into ONE row per event type, so the
# cross-cell combination (the DiD double difference and the 4-term
# variance sum) is a row-local FIXED-ORDER expression chain — never a
# cross-row double aggregation.  Cell means/variances come from the
# exact ANOVA-centered BIGINT sums + centi-divmod variance.
_DID_CELLS = ("c_pre", "c_post", "t_pre", "t_post")


def _did_mean_sql(cell: str) -> str:
    return f"CAST(t_{cell} AS DOUBLE) / CAST(n_{cell} AS DOUBLE)"


def _did_vterm_sql(cell: str) -> str:
    """s^2_cell / n_cell from the centi-quantized variance."""
    return (
        f"CAST(v_{cell} AS DOUBLE)"
        f" / CAST(100 * (n_{cell} - 1) * n_{cell} AS DOUBLE)"
    )


_DID_SQL = (
    f"(({_did_mean_sql('t_post')}) - ({_did_mean_sql('t_pre')}))"
    f" - (({_did_mean_sql('c_post')}) - ({_did_mean_sql('c_pre')}))"
)
_DID_SE_SQL = (
    f"sqrt((({_did_vterm_sql('t_post')}) + ({_did_vterm_sql('t_pre')}))"
    f" + (({_did_vterm_sql('c_post')}) + ({_did_vterm_sql('c_pre')})))"
)


def _did_cell_sums_sql(cell: str, cond: str) -> str:
    """The three conditional BIGINT sums for one (treat, post) cell."""
    return (
        f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_{cell},\n"
        f"               CAST(sum(CASE WHEN {cond} THEN d ELSE 0 END) AS BIGINT) AS t_{cell},\n"
        f"               CAST(sum(CASE WHEN {cond} THEN d * d ELSE 0 END) AS BIGINT) AS sdd_{cell}"
    )


@register(
    "r_did_estimator",
    oracle=f"""
    WITH src AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) - {_ANOVA_CENTER} AS d,
               CAST({hash60_sql("CAST(user_id AS VARCHAR)")} % 2 AS BIGINT) AS treat,
               CAST(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_SPLIT}'
                    THEN 1 ELSE 0 END AS BIGINT) AS post
        FROM events
    ),
    cells AS (
        SELECT event_type,
               {_did_cell_sums_sql('c_pre', 'treat = 0 AND post = 0')},
               {_did_cell_sums_sql('c_post', 'treat = 0 AND post = 1')},
               {_did_cell_sums_sql('t_pre', 'treat = 1 AND post = 0')},
               {_did_cell_sums_sql('t_post', 'treat = 1 AND post = 1')}
        FROM src GROUP BY event_type
    ),
    vc AS (
        SELECT *,
               CAST(sdd_c_pre * 100 - {_ss_centi_sql('t_c_pre', 'n_c_pre')} AS BIGINT) AS v_c_pre,
               CAST(sdd_c_post * 100 - {_ss_centi_sql('t_c_post', 'n_c_post')} AS BIGINT) AS v_c_post,
               CAST(sdd_t_pre * 100 - {_ss_centi_sql('t_t_pre', 'n_t_pre')} AS BIGINT) AS v_t_pre,
               CAST(sdd_t_post * 100 - {_ss_centi_sql('t_t_post', 'n_t_post')} AS BIGINT) AS v_t_post
        FROM cells
        WHERE n_c_pre >= 2 AND n_c_post >= 2 AND n_t_pre >= 2 AND n_t_post >= 2
    )
    SELECT event_type,
           n_c_pre, n_c_post, n_t_pre, n_t_post,
           {r6_sql(_DID_SQL)} AS did_cents,
           {r6_sql(_DID_SE_SQL)} AS se_cents,
           {r6_sql(f'({_DID_SQL}) / ({_DID_SE_SQL})')} AS t_stat,
           CAST(CASE WHEN abs(({_DID_SQL}) / ({_DID_SE_SQL})) > {_PW_Z_ALPHA}
                THEN 1 ELSE 0 END AS INT) AS significant
    FROM vc
    WHERE v_c_pre > 0 AND v_c_post > 0 AND v_t_pre > 0 AND v_t_post > 0
    ORDER BY event_type
    """,
)
def r_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator per event type — the causal
    readout completing the experimentation family (r_srm_check gates
    the assignment, r_power_analysis sizes, r_cuped_variance_reduction
    tightens, this key estimates): users hash into treat/control (the
    shared md5 hash60 split), days split pre/post at the shared CUPED
    date literal, and the effect is the classic double difference
    (treat_post - treat_pre) - (ctrl_post - ctrl_pre) with the
    4-cell unpooled variance and a z-gate at the shared 1.959964.

    Determinism: ONE conditional aggregation pivots all four cells'
    exact BIGINT sufficient statistics into a single row per type, so
    the double difference and the 4-term variance sum are row-local
    FIXED-ORDER IEEE chains (never a cross-row double sum); cell
    variances use the ANOVA centi-divmod quantization; sqrt is
    IEEE-exact; the expression text is generated once and spliced into
    both engines.

    Scale shape: ONE map-side-combined aggregation to |event_types|
    rows (12 conditional sums in the same pass); everything after is
    row-local arithmetic on that bounded frame."""
    ev = load_table(spark, sf_dir, "events")
    d = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") - F.lit(
        _ANOVA_CENTER
    )
    treat = (hash60(F.col("user_id").cast("string")) % 2).cast("bigint")
    post = F.when(
        F.col("ts").cast("date") >= F.lit(_CUPED_SPLIT).cast("date"), 1
    ).otherwise(0).cast("bigint")
    src = ev.select(
        "event_type", d.alias("d"), treat.alias("treat"), post.alias("post")
    )
    conds = {
        "c_pre": (F.col("treat") == 0) & (F.col("post") == 0),
        "c_post": (F.col("treat") == 0) & (F.col("post") == 1),
        "t_pre": (F.col("treat") == 1) & (F.col("post") == 0),
        "t_post": (F.col("treat") == 1) & (F.col("post") == 1),
    }
    aggs = []
    for cell, cond in conds.items():
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n_{cell}"),
            F.sum(F.when(cond, F.col("d")).otherwise(0)).cast("bigint").alias(f"t_{cell}"),
            F.sum(F.when(cond, F.col("d") * F.col("d")).otherwise(0))
            .cast("bigint")
            .alias(f"sdd_{cell}"),
        ]
    cells = src.groupBy("event_type").agg(*aggs)
    vc = cells.filter(
        (F.col("n_c_pre") >= 2) & (F.col("n_c_post") >= 2)
        & (F.col("n_t_pre") >= 2) & (F.col("n_t_post") >= 2)
    )
    for cell in _DID_CELLS:
        vc = vc.withColumn(
            f"v_{cell}",
            (
                F.col(f"sdd_{cell}") * 100
                - _ss_centi_expr(f"t_{cell}", f"n_{cell}")
            ).cast("bigint"),
        )
    did, se = F.expr(_DID_SQL), F.expr(_DID_SE_SQL)
    return (
        vc.filter(
            (F.col("v_c_pre") > 0) & (F.col("v_c_post") > 0)
            & (F.col("v_t_pre") > 0) & (F.col("v_t_post") > 0)
        )
        .select(
            "event_type",
            "n_c_pre", "n_c_post", "n_t_pre", "n_t_post",
            r6(did).alias("did_cents"),
            r6(se).alias("se_cents"),
            r6(did / se).alias("t_stat"),
            F.when(F.abs(did / se) > float(_PW_Z_ALPHA), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("significant"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# r_did_pretrend

_PRETREND_SLOPE = (
    "CAST(n{a} * sdc{a} - sd{a} * sc{a} AS DOUBLE)"
    " / CAST(n{a} * sdd{a} - sd{a} * sd{a} AS DOUBLE)"
)
_PRETREND_T = _PRETREND_SLOPE.format(a="_t")
_PRETREND_C = _PRETREND_SLOPE.format(a="_c")


@register(
    "r_did_pretrend",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST({hash60_sql("CAST(user_id AS VARCHAR)")} % 2 AS BIGINT) AS treat,
               CAST(date_diff('day', DATE '{_OLS_EPOCH}', CAST(ts AS DATE)) AS BIGINT) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        FROM events
        WHERE CAST(ts AS DATE) < DATE '{_CUPED_SPLIT}'
        GROUP BY 1, 2, 3
    ),
    arm AS (
        SELECT event_type, treat,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d) AS BIGINT) AS sd,
               CAST(sum(d * d) AS BIGINT) AS sdd,
               CAST(sum(c) AS BIGINT) AS sc,
               CAST(sum(d * c) AS BIGINT) AS sdc
        FROM daily GROUP BY event_type, treat
    ),
    wide AS (
        SELECT event_type,
               CAST(max(CASE WHEN treat = 1 THEN n END) AS BIGINT) AS n_t,
               CAST(max(CASE WHEN treat = 1 THEN sd END) AS BIGINT) AS sd_t,
               CAST(max(CASE WHEN treat = 1 THEN sdd END) AS BIGINT) AS sdd_t,
               CAST(max(CASE WHEN treat = 1 THEN sc END) AS BIGINT) AS sc_t,
               CAST(max(CASE WHEN treat = 1 THEN sdc END) AS BIGINT) AS sdc_t,
               CAST(max(CASE WHEN treat = 0 THEN n END) AS BIGINT) AS n_c,
               CAST(max(CASE WHEN treat = 0 THEN sd END) AS BIGINT) AS sd_c,
               CAST(max(CASE WHEN treat = 0 THEN sdd END) AS BIGINT) AS sdd_c,
               CAST(max(CASE WHEN treat = 0 THEN sc END) AS BIGINT) AS sc_c,
               CAST(max(CASE WHEN treat = 0 THEN sdc END) AS BIGINT) AS sdc_c
        FROM arm GROUP BY event_type
    )
    SELECT event_type,
           n_t AS n_days_treat, n_c AS n_days_ctrl,
           {r6_sql(_PRETREND_T)} AS slope_treat,
           {r6_sql(_PRETREND_C)} AS slope_ctrl,
           {r6_sql(f'({_PRETREND_T}) - ({_PRETREND_C})')} AS pretrend_gap
    FROM wide
    WHERE n_t IS NOT NULL AND n_c IS NOT NULL
      AND n_t * sdd_t - sd_t * sd_t > 0
      AND n_c * sdd_c - sd_c * sd_c > 0
    ORDER BY event_type
    """,
)
def r_did_pretrend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-trends diagnostic for r_did_estimator — the validity
    check every difference-in-differences readout requires: over the
    PRE-period only, fit the per-arm OLS slope of daily spend vs
    calendar day (the r_ols_by_group closed form, same epoch) for the
    treat and control arms under the same hash60 split, and report the
    slope gap. A nonzero pre-trend gap means the arms were already
    diverging before treatment and the DiD estimate is confounded.

    Determinism: arm-level daily totals are exact BIGINT cents; the
    five OLS moments per (type, arm) reduce in one map-side-combined
    pass; a conditional MAX pivots both arms into ONE row per type, so
    both slopes and their difference are row-local fixed-order IEEE
    ratios of exact integers (never a cross-row double sum); all
    epoch/split/assignment constants are the shared literals of the
    OLS / CUPED / SRM keys.

    Scale shape: one rollup to |types| x 2 x |days| rows, one to
    |types| x 2, one conditional pivot to |types| — raw event volume
    touches only the first pass."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").cast("date") < F.lit(_CUPED_SPLIT).cast("date"))
        .groupBy(
            "event_type",
            (hash60(F.col("user_id").cast("string")) % 2)
            .cast("bigint")
            .alias("treat"),
            F.datediff(
                F.col("ts").cast("date"), F.lit(_OLS_EPOCH).cast("date")
            )
            .cast("bigint")
            .alias("d"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("c")
        )
    )
    arm = daily.groupBy("event_type", "treat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("d") * F.col("c")).cast("bigint").alias("sdc"),
    )
    wide = arm.groupBy("event_type").agg(
        *[
            F.max(F.when(F.col("treat") == tv, F.col(col)))
            .cast("bigint")
            .alias(f"{col}_{suf}")
            for tv, suf in ((1, "t"), (0, "c"))
            for col in ("n", "sd", "sdd", "sc", "sdc")
        ]
    )
    st, sc_ = F.expr(_PRETREND_T), F.expr(_PRETREND_C)
    return (
        wide.filter(
            F.col("n_t").isNotNull()
            & F.col("n_c").isNotNull()
            & (F.col("n_t") * F.col("sdd_t") - F.col("sd_t") * F.col("sd_t") > 0)
            & (F.col("n_c") * F.col("sdd_c") - F.col("sd_c") * F.col("sd_c") > 0)
        )
        .select(
            "event_type",
            F.col("n_t").alias("n_days_treat"),
            F.col("n_c").alias("n_days_ctrl"),
            r6(st).alias("slope_treat"),
            r6(sc_).alias("slope_ctrl"),
            r6(st - sc_).alias("pretrend_gap"),
        )
        .orderBy("event_type")
    )
