"""Adversarial rounding-boundary fixtures (VERDICT r5 #7).

The sf parity sweep can pass 93/93 while a native-round regression stays
latent: the boundary class is data-dependent (a ratio of integers must
terminate at exactly d+1 decimal digits AND the two engines' rounding
paths — Spark's shortest-decimal HALF_UP vs DuckDB's raw multiply-and-
round — must land on different sides). This module generates a tiny
corpus whose aggregate ratios land EXACTLY on such live boundaries —
every at-risk query here fails its oracle if anyone swaps the rN/r6
helper back to native ``round``.

Pinned boundaries, each verified disagreeing (Spark up, DuckDB down):

- 829/800    = 1.03625    -> l_corpus_stats avg_chars (d=4, srcA)
- 1287/640   = 2.0109375  -> l_text_stats avg_chars (d=6, lang=bb)
- 5123/640   = 8.0046875  -> l_text_stats avg_tokens (d=6, lang=bb)
- 1001/16000 = 0.0625625  -> l_heavy_hitters frequency (d=6)
- 641/640    = 1.0015625  -> r_hash_agg avg_qty (d=6)
- 333/640    = 0.5203125  -> r_retention retention_rate (d=6; the
                             original round-5 failure value)

Note the search for these is non-trivial: "raw double below the exact
ratio" is NOT sufficient (DuckDB multiplies by 10^d first, and that
product often rounds back ONTO the .5 tie, agreeing with Spark — e.g.
every k/160 at d=4 agrees). The canary test below keeps the pins honest.
"""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bristle_spark.registry import all_specs
from tests.conftest import assert_frames_match

AT_RISK = [
    "l_corpus_stats",
    "l_text_stats",
    "l_heavy_hitters",
    "r_hash_agg",
    "r_retention",
]

# (numerator, denominator, digits) proven live boundaries
BOUNDARIES = [
    (829, 800, 4),
    (1287, 640, 6),
    (5123, 640, 6),
    (1001, 16000, 6),
    (641, 640, 6),
    (333, 640, 6),
]


def _documents():
    """1440 docs in two (lang, source) slices; n_chars is an independent
    column (it need not equal len(text)), so char-sum and token-sum
    boundaries are set independently:

    - aa/srcA: 800 docs, sum(n_chars) = 829  (771x1 + 29x2)
               sum(tokens) = 10877           (323x13 + 477x14)
    - bb/srcB: 640 docs, sum(n_chars) = 1287 (639x2 + 1x9)
               sum(tokens) = 5123            (637x8 + 3x9)
    - corpus total tokens = 16000; token 'zz' appears 1001 times (in
      slice aa), every other token globally unique -> exactly one heavy
      hitter at the 1001/16000 boundary.
    """
    doc_id, text, lang, source, n_chars = [], [], [], [], []
    uid = 0
    zz_left = 1001

    def add_doc(i, lg, src, chars, ntok, nzz):
        nonlocal uid, zz_left
        nzz = min(nzz, zz_left)
        zz_left -= nzz
        toks = ["zz"] * nzz
        while len(toks) < ntok:
            toks.append(f"u{uid}")
            uid += 1
        doc_id.append(i)
        text.append(" ".join(toks))
        lang.append(lg)
        source.append(src)
        n_chars.append(chars)

    i = 0
    for j in range(800):
        add_doc(i, "aa", "srcA", 2 if j < 29 else 1, 14 if j < 477 else 13, 2)
        i += 1
    for j in range(640):
        add_doc(i, "bb", "srcB", 9 if j == 0 else 2, 9 if j < 3 else 8, 0)
        i += 1
    assert zz_left == 0
    assert sum(n_chars[:800]) == 829 and sum(n_chars[800:]) == 1287
    ntok_all = sum(len(t.split(" ")) for t in text)
    assert ntok_all == 16000, ntok_all
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def _lineitem():
    """One (N, O) group, 640 rows: 639x qty 1 + 1x qty 2 -> sum 641,
    avg_qty = 641/640 = 1.0015625."""
    n = 640
    ship = datetime.datetime(1998, 1, 1)
    qty = [2.0] + [1.0] * (n - 1)
    return pa.table(
        {
            "l_orderkey": pa.array(range(n), pa.int64()),
            "l_partkey": pa.array([i % 50 for i in range(n)], pa.int64()),
            "l_suppkey": pa.array([i % 10 for i in range(n)], pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array(qty, pa.float64()),
            "l_extendedprice": pa.array([100.01 + 0.13 * i for i in range(n)], pa.float64()),
            "l_discount": pa.array([0.01 * (i % 9) for i in range(n)], pa.float64()),
            "l_tax": pa.array([0.01 * (i % 7) for i in range(n)], pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([ship] * n, pa.timestamp("us")),
        }
    )


def _events():
    """640 users in one cohort day; 333 of them active again 3 days
    later -> retention_rate = 333/640 = 0.5203125."""
    day0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    day3 = datetime.datetime(2024, 1, 4, 12, 0, 0)
    eid, ts, user = [], [], []
    for u in range(640):
        eid.append(len(eid))
        ts.append(day0)
        user.append(u)
    for u in range(333):
        eid.append(len(eid))
        ts.append(day3)
        user.append(u)
    n = len(eid)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


@pytest.fixture(scope="session")
def boundary_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("boundary_sf")
    pq.write_table(_documents(), str(d / "documents.parquet"))
    pq.write_table(_lineitem(), str(d / "lineitem.parquet"))
    pq.write_table(_events(), str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def boundary_oracle(boundary_dir):
    con = duckdb.connect()
    for t in ("documents", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{boundary_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("num,den,digits", BOUNDARIES)
def test_fixture_ratios_are_live_boundaries(num, den, digits):
    """If native round ever starts agreeing on these values, the fixture
    has lost its teeth and needs new numerators."""
    duck = duckdb.sql(
        f"SELECT round(CAST({num} AS DOUBLE) / {den}, {digits})"
    ).fetchone()[0]
    # Spark's F.round on doubles: BigDecimal(shortest repr), HALF_UP
    spark_like = float(
        decimal.Decimal(repr(num / den)).quantize(
            decimal.Decimal(1).scaleb(-digits), rounding=decimal.ROUND_HALF_UP
        )
    )
    assert duck != spark_like, (num, den, digits, duck)


@pytest.mark.parametrize("name", AT_RISK)
def test_boundary_parity(name, spark, boundary_oracle, boundary_dir):
    spec = all_specs()[name]
    spark_pdf = spec.fn(spark, boundary_dir).toPandas()
    oracle_pdf = boundary_oracle.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing theorem: any match of at least w+k-1 tokens is
    caught — two documents sharing such a run must share at least one
    selected gram_hash."""
    import tempfile

    from pyspark.sql import functions as F

    from bristle_spark.queries.textops import WINNOW_K, WINNOW_W
    from bristle_spark.registry import all_specs

    run = " ".join(f"shared{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    docs = [
        (1, f"alpha beta gamma {run} delta epsilon zeta", "en", "srcA", 0),
        (2, f"one two three four five {run} six seven eight", "en", "srcB", 0),
        (3, "totally different words with no overlap at all here", "en", "srcC", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        fp = all_specs()["l_winnow_fingerprint"].fn(spark, d).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    assert by_doc[1] & by_doc[2], "shared >=w+k-1 token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_snapshot_diff_covers_all_four_classes(spark, sf_dir):
    """The chosen snapshot windows must exercise every CDC class —
    a diff that only ever emits 'update' proves nothing about
    insert/delete handling."""
    from bristle_spark.registry import all_specs

    classes = {
        r["change"]
        for r in all_specs()["r_snapshot_diff"].fn(spark, sf_dir).collect()
    }
    assert classes == {"insert", "update", "delete", "unchanged"}


def test_events_have_no_per_user_timestamp_ties():
    """r_window_funnel's single-scan rewrite orders per-user events by
    timestamp with no extra tiebreak; its equivalence to the oracle's
    strict-inequality EXISTS form requires that no user has two events
    in the same microsecond. Pin that fixture property at every scale
    the oracles run at — if a regenerated fixture ever violates it,
    this failure points at the query to harden rather than a flaky
    hash mismatch."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        n = duckdb.sql(
            f"""SELECT count(*) FROM (
                SELECT user_id, ts, count(*) AS c
                FROM read_parquet('/root/testdata/sf{sf}/events.parquet')
                GROUP BY user_id, ts HAVING count(*) > 1
            )"""
        ).fetchone()[0]
        assert n == 0, f"sf{sf}: {n} per-user same-microsecond ties"


def test_duplicate_spans_merges_abutting_ranges(spark):
    """Two duplicated 8-token windows whose token ranges ABUT (window
    starts 1 and 9: ranges [1,8] + [9,16]) must merge into ONE maximal
    span [1,16] — the self-review r11 off-by-one (gap == SPAN_WORDS was
    wrongly treated as a break). Doc 4's isolated duplicate run, a full
    clean token away, must stay its own span."""
    import tempfile

    w = [f"w{i}" for i in range(1, 17)]
    docs = [
        (1, " ".join(w), "en", "srcA", 0),                       # w1..w16
        (2, " ".join(w[:8]), "en", "srcB", 0),                   # w1..w8
        (3, " ".join(w[8:]), "en", "srcC", 0),                   # w9..w16
        # w1..w8 + a clean separator + w9..w16: two spans expected
        (4, " ".join(w[:8]) + " zzz " + " ".join(w[8:]), "en", "srcD", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = all_specs()["l_duplicate_spans"].fn(spark, d).collect()
    spans = {}
    for r in rows:
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert spans[1] == [(1, 16)], spans  # abutting ranges merged maximal
    assert spans[2] == [(1, 8)] and spans[3] == [(1, 8)]
    assert sorted(spans[4]) == [(1, 8), (10, 17)], spans  # separator holds
