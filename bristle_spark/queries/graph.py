"""Group L — graph analytics over the document corpus.

The corpus induces a natural similarity graph: documents are vertices,
and two documents are adjacent when they share at least one *rare*
3-word shingle (the l_dedup_ngram_jaccard candidate generator, df cap
{MAX_SHINGLE_DF} — the same scale lever: a shingle in d docs emits d^2
edges, so the cap bounds the self-join while dense near-dup
neighborhoods stay connected). l_dedup_clusters answers "which
component"; PageRank answers "which documents sit at the CENTER of
duplication mass" — the doc a curator inspects first when deciding
whether a whole template family should be dropped.

Reference parity: the reference engine (a gRPC→ClickHouse ingest pipe,
`ingest_service.go`) has no graph surface; this is LLM-pipeline
capability the Spark engine adds, numpy-pinned like the other
iterative trainers (tests/test_pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bristle_spark.catalog import load_table
from bristle_spark.functions.hashing import hash60, hash60_sql
from bristle_spark.functions.rounding import r6, r6_sql
from bristle_spark.queries.dedup import (
    MAX_SHINGLE_DF,
    _capped_pair_candidates,
    _rare_shingle_hashes,
    _shingles_sql,
    _tokens,
)
from bristle_spark.registry import register

PAGERANK_ITERS = 5  # fixed rounds -> deterministic trajectory
PAGERANK_D = 0.85
PAGERANK_TOP = 20


def doc_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed edge list (src, dst) of the rare-shingle co-occurrence
    graph, BOTH directions per undirected pair.

    Pair generation (r16, guide §2.4): the df-capped postings expand to
    pairs row-locally (_capped_pair_candidates; skew-safety argument in
    its docstring), replacing the alias-renamed inverted-index
    self-join.  Measured identical edge sets; 2.03 -> 1.86 s for the
    edge build at sf0.1 (the filter-after-collect variant measures
    1.25 s but is an OOM hazard on hot shingles; the extra 0.6 s is the
    price of the skew guard)."""
    d = _tokens(load_table(spark, sf_dir, "documents"))
    half = _capped_pair_candidates(
        _rare_shingle_hashes(d), a="src", b="dst"
    )
    # NOT persisted (r16, measured): the two union branches are
    # byte-identical up to the final projection, so runtime exchange
    # reuse already dedups the pair expansion + distinct (the
    # r_market_basket finding); an explicit persist measured
    # 8.0 -> 9.4 s on l_pagerank.
    return half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


@register("l_pagerank", oracle=None)
def l_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the rare-shingle document-similarity graph:
    {PAGERANK_ITERS} fixed power-iteration rounds, damping
    {PAGERANK_D}, uniform init 1/N over ALL documents (isolated docs
    are dangling vertices whose mass redistributes uniformly each
    round, the standard correction). Output: the top-{PAGERANK_TOP}
    most central documents (ties -> lowest doc_id) with their degree.

    Spark-first iteration (the l_dedup_clusters / l_ivf_train_kmeans
    shape): the edge list and out-degrees are computed ONCE and
    persisted; each round is a corpus-keyed join of ranks to edges +
    a dst-keyed map-side-combined sum — the only shuffles, all on doc
    ids, reusing the same partitioning round over round. At 100 TB the
    edge list is the big table and every shuffle is keyed on doc ids —
    no vertex-count-squared term anywhere. Rows-only (iterative float
    trajectory has no SQL oracle); pinned to a numpy power-iteration
    reference in tests/test_pagerank.py.

    Dangling mass analytically (r16, guide §1.2 "the distributed
    algorithm" / §2.4): the edge list is SYMMETRIC (both directions of
    every undirected pair), so a deg-0 vertex has no in-edges either —
    its inflow is always 0 and its rank follows the scalar recurrence
    prI_{{k+1}} = (1-d)/n + d·dm_k/n with dm_k = n0·prI_k (n0 = number
    of isolated vertices, constant).  The old per-round 1-row
    dangling-mass AGGREGATE + broadcast — which forced an eager
    localCheckpoint barrier every round (2 jobs/round, 10 jobs of pure
    scheduling overhead at sf0.1) — is replaced by a driver-side float
    recurrence feeding a literal, and all {PAGERANK_ITERS} rounds fuse
    into ONE lazy plan whose stages AQE sizes adaptively (measured
    9.8 s → see OPTIMIZATION_r16.md).  Numerics: dm as n0·prI differs
    from the old distributed sum of n0 identical doubles by at most an
    ulp-level association difference; the trajectory pin
    (tests/test_pagerank.py, abs=2e-6 on 6-dp outputs) and the
    rows-only driver contract both hold."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = doc_graph_edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    verts = docs.join(deg, docs.doc_id == deg.src, "left").select(
        "doc_id", F.coalesce("deg", F.lit(0)).alias("deg")
    ).persist()
    n_docs = verts.count()  # also materializes verts/edges for the loop
    if n_docs == 0:  # empty corpus: no vertices, nothing to iterate
        return verts.select(
            "doc_id",
            F.col("deg").cast("bigint").alias("degree"),
            F.lit(0.0).alias("pagerank"),
        )
    n0 = verts.filter(F.col("deg") == 0).count()  # isolated vertices

    # Iterate over the CONNECTED subgraph only (r16): isolated vertices
    # never send or receive edge mass, so the per-round joins carry just
    # the vertices that have edges — at 100 TB a dedup-similarity graph
    # is mostly isolated docs, so this shrinks every round's shuffle to
    # the live subgraph. The update expression for connected vertices is
    # byte-identical to the all-vertices form; isolated vertices get the
    # literal their own update would compute (inflow = 0 every round).
    verts_c = verts.filter(F.col("deg") > 0)
    # Per-round shape (r16): the edge list is symmetric, so every
    # connected vertex receives inflow every round — contrib itself
    # covers the whole live vertex set, and riding deg_dst along on the
    # (broadcast, round-invariant, exchange-reused) edge frame removes
    # the old per-round verts-join entirely.  One join + one dst-keyed
    # map-side-combined aggregation per round, all lazily fused.
    edges_d = edges.join(
        verts_c.select(F.col("doc_id").alias("dst"), F.col("deg").alias("deg_dst")),
        "dst",
    )
    pr = verts_c.select("doc_id", "deg", F.lit(1.0 / n_docs).alias("pr"))
    pr_isolated = 1.0 / n_docs  # every deg-0 vertex carries this rank
    for _ in range(PAGERANK_ITERS):
        dm = n0 * pr_isolated
        pr = (
            pr.join(edges_d, pr.doc_id == edges_d.src)
            .select("dst", "deg_dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst", "deg_dst")
            .agg(F.sum("c").alias("inflow"))
            .select(
                F.col("dst").alias("doc_id"),
                F.col("deg_dst").alias("deg"),
                (
                    F.lit((1.0 - PAGERANK_D) / n_docs)
                    + PAGERANK_D
                    * (F.col("inflow") + F.lit(dm) / n_docs)
                ).alias("pr"),
            )
        )
        # the same update applied to an isolated vertex (inflow = 0)
        pr_isolated = (1.0 - PAGERANK_D) / n_docs + PAGERANK_D * (dm / n_docs)
    final = pr.unionByName(
        verts.filter(F.col("deg") == 0).select(
            "doc_id", "deg", F.lit(pr_isolated).alias("pr")
        )
    )
    return (
        final.select(
            "doc_id",
            F.col("deg").cast("bigint").alias("degree"),
            F.round("pr", 6).alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), "doc_id")
        .limit(PAGERANK_TOP)
    )


# ------------------------------------------------- triangle counting
# 4-word shingles for the triangle graph: the 5-gram rare-shingle graph
# is triangle-sparse (6 triangles at sf0.001, 1 at sf0.01 — measured),
# while 4-grams under the same df cap give a connected similarity
# neighborhood (43 / 32 / 8.9k triangles at sf0.001/0.01/0.1) without
# losing the df-cap pair bound.
TRI_SHINGLE_WORDS = 4
TRI_TOP = 20

_TRI_SHINGLES_SQL = _shingles_sql(TRI_SHINGLE_WORDS)

_TRI_EDGE_CTES = f"""
    tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= {TRI_SHINGLE_WORDS}
    ),
    sh AS (
        SELECT doc_id, {hash60_sql("s")} AS hs
        FROM (SELECT doc_id, unnest({_TRI_SHINGLES_SQL}) AS s FROM tok)
    ),
    rare AS (SELECT hs FROM sh GROUP BY hs HAVING count(*) <= {MAX_SHINGLE_DF}),
    half AS (
        SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        FROM sh a JOIN rare r ON a.hs = r.hs
        JOIN sh b ON b.hs = a.hs AND a.doc_id < b.doc_id
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM half UNION ALL SELECT v FROM half)
        GROUP BY node
    )
"""


def _tri_half_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (u < v) edge list of the 4-gram rare-shingle graph —
    the doc_graph_edges pair generation (df-cap window, then a grouped
    row-local 2-combination expansion; see that docstring for the
    skew-safety argument) at TRI_SHINGLE_WORDS. Shared by
    l_graph_triangles and l_graph_assortativity; callers persist (it
    feeds 2-3 plan branches each)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", F.split("text", " "))
        .filter(F.size("t") >= TRI_SHINGLE_WORDS)
    )
    return _capped_pair_candidates(
        _rare_shingle_hashes(d, k=TRI_SHINGLE_WORDS), a="u", b="v"
    )


@register(
    "l_graph_triangles",
    oracle=f"""
    WITH {_TRI_EDGE_CTES},
    o AS (
        SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND h.u < h.v)
                    THEN h.u ELSE h.v END AS a,
               CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND h.u < h.v)
                    THEN h.v ELSE h.u END AS b,
               CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND h.u < h.v)
                    THEN dv.deg ELSE du.deg END AS bdeg
        FROM half h
        JOIN deg du ON du.node = h.u
        JOIN deg dv ON dv.node = h.v
    ),
    tri AS (
        SELECT x.a AS v1, x.b AS v2, y.b AS v3
        FROM o x
        JOIN o y ON y.a = x.a
                AND (x.bdeg < y.bdeg OR (x.bdeg = y.bdeg AND x.b < y.b))
        JOIN o z ON z.a = x.b AND z.b = y.b
    ),
    per AS (
        SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (SELECT v1 AS v FROM tri
              UNION ALL SELECT v2 FROM tri
              UNION ALL SELECT v3 FROM tri)
        GROUP BY v
    )
    SELECT p.doc_id, d.deg AS degree, p.n_triangles
    FROM per p JOIN deg d ON d.node = p.doc_id
    ORDER BY n_triangles DESC, doc_id LIMIT {TRI_TOP}
    """,
)
def l_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over the 4-gram rare-shingle
    similarity graph — the local clustering signal a dedup curator uses
    to tell TEMPLATE FAMILIES (dense, triangle-rich neighborhoods where
    everything resembles everything) from chains of pairwise borrowings
    (triangle-free paths). Top-{TRI_TOP} docs by triangle membership,
    ties by doc_id.

    Scale shape — the published degree-ordered orientation (Cohen 2009
    / Schank-Wagner "forward" algorithm): every undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher one, so
    each wedge is generated at its LOWEST-degree apex and the pair
    blowup is sum_v min(deg_v, sqrt(E))^2 = O(E^1.5) instead of
    sum deg^2 — hub vertices never enumerate their neighbor pairs. All
    three joins (edges->deg twice, wedge->closing edge) are keyed on
    vertex ids / id pairs; candidate rows carry ids only; the final cut
    is TakeOrderedAndProject. Edge generation reuses the df-capped
    inverted-index discipline (a shingle in d docs emits <= d^2/2
    pairs, d <= {MAX_SHINGLE_DF}), so the graph build is the
    l_dedup_ngram_jaccard shape."""
    # the edge list feeds deg AND the orientation join; without the
    # persist the df-capped pair expansion re-runs once per downstream
    # scan (measured 5.9s -> 2s at sf0.1, r15; generation itself moved
    # to the grouped row-local expansion in r16 — see _tri_half_edges)
    half = _tri_half_edges(spark, sf_dir).persist()
    deg = (
        half.select(F.col("u").alias("node"))
        .union(half.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        # three consumers (both orientation sides + the final degree
        # join), and the alias-renamed subtrees defeat runtime exchange
        # reuse — persist so the degree rollup runs once (r15)
        .persist()
    )
    du = deg.select(F.col("node").alias("un"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("vn"), F.col("deg").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        half.join(du, F.col("u") == F.col("un"))
        .join(dv, F.col("v") == F.col("vn"))
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("bdeg"),
        )
        # three scans below (wedge x2 + closing edge): persist so the
        # orientation join runs once
        .persist()
    )
    ox = o.select(F.col("a").alias("xa"), F.col("b").alias("xb"), F.col("bdeg").alias("xd"))
    oy = o.select(F.col("a").alias("ya"), F.col("b").alias("yb"), F.col("bdeg").alias("yd"))
    oz = o.select(F.col("a").alias("za"), F.col("b").alias("zb"))
    tri = (
        ox.join(
            oy,
            (F.col("ya") == F.col("xa"))
            & (
                (F.col("xd") < F.col("yd"))
                | ((F.col("xd") == F.col("yd")) & (F.col("xb") < F.col("yb")))
            ),
        )
        .join(oz, (F.col("za") == F.col("xb")) & (F.col("zb") == F.col("yb")))
        .select(F.col("xa").alias("v1"), F.col("xb").alias("v2"), F.col("yb").alias("v3"))
    )
    per = (
        tri.select(F.explode(F.array("v1", "v2", "v3")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        per.join(deg, per.doc_id == deg.node)
        .select("doc_id", F.col("deg").alias("degree"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "doc_id")
        .limit(TRI_TOP)
    )


# ------------------------------------------------- degree assortativity


@register(
    "l_graph_assortativity",
    oracle=f"""
    WITH {_TRI_EDGE_CTES},
    ends AS (
        SELECT du.deg AS dx, dv.deg AS dy
        FROM half h
        JOIN deg du ON du.node = h.u
        JOIN deg dv ON dv.node = h.v
    ),
    -- symmetrize: each undirected edge contributes BOTH (dx, dy) and
    -- (dy, dx), so Sx = Sy and Sxx = Syy exactly and Newman's r is
    -- the plain Pearson over the 2E endpoint pairs
    sym AS (
        SELECT dx, dy FROM ends UNION ALL SELECT dy AS dx, dx AS dy FROM ends
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS m2,
               CAST(sum(dx) AS BIGINT) AS sx,
               CAST(sum(dx * dx) AS BIGINT) AS sxx,
               CAST(sum(dx * dy) AS BIGINT) AS sxy
        FROM sym
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT nn.n_nodes, m.m2 // 2 AS n_edges,
           m.sx, m.sxx, m.sxy,
           CASE WHEN m.m2 * m.sxx - m.sx * m.sx > 0 THEN
               {r6_sql('CAST(m.m2 * m.sxy - m.sx * m.sx AS DOUBLE) / CAST(m.m2 * m.sxx - m.sx * m.sx AS DOUBLE)')}
           END AS assortativity
    FROM m CROSS JOIN nn
    """,
)
def l_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the 4-gram rare-shingle
    similarity graph — does near-duplicate content attach to equally-
    duplicated content (r > 0: template families clumping into dense
    same-degree cores) or to hubs (r < 0: a few canonical documents
    echoed by many one-off copies)?  The single number a curator reads
    before choosing between component-level and hub-level dedup
    policy; complements l_graph_triangles (local clustering) and
    l_pagerank (centrality) on the same graph.

    Determinism: degrees are exact BIGINTs; the edge list is
    symmetrized so Sx = Sy / Sxx = Syy hold EXACTLY and Pearson's r
    reduces to (M*Sxy - Sx^2) / (M*Sxx - Sx^2) — every moment an
    exact integer sum, the statistic ONE double division, rounded r6.
    A degree-regular graph (zero variance) yields NULL identically on
    both engines.  Int64 headroom: sum over 2E endpoint pairs of
    dx*dy <= 2E * dmax^2; with the df-cap bounding dmax <=
    {MAX_SHINGLE_DF}^2-ish neighborhoods the moments sit orders of
    magnitude inside 2^63 — wraps would need ~1e9 edges at dmax ~ 1e3.

    Scale shape: the df-capped inverted-index edge build (the
    l_dedup_ngram_jaccard bound: a shingle in d docs emits <= d^2/2
    pairs, d <= {MAX_SHINGLE_DF}), one id-keyed degree rollup, two
    broadcast-able degree joins onto the edge list, then ONE
    map-side-combined moment aggregation to a single row — no window,
    no global sort, nothing driver-side."""
    # feeds deg AND the endpoint join: persist so the df-capped pair
    # expansion runs once (the triangle discipline)
    half = _tri_half_edges(spark, sf_dir).persist()
    deg = (
        half.select(F.col("u").alias("node"))
        .union(half.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        # three consumers (both endpoint joins + the node count), and
        # the alias-renamed subtrees defeat runtime exchange reuse —
        # persist so the degree rollup runs once (r15)
        .persist()
    )
    du = deg.select(F.col("node").alias("un"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("node").alias("vn"), F.col("deg").alias("dy"))
    ends = (
        half.join(du, F.col("u") == F.col("un"))
        .join(dv, F.col("v") == F.col("vn"))
        .select("dx", "dy")
    )
    sym = ends.union(ends.select(F.col("dy").alias("dx"), F.col("dx").alias("dy")))
    m = sym.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    denom = F.col("m2") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        m.crossJoin(F.broadcast(nn))
        .select(
            "n_nodes",
            F.expr("m2 DIV 2").cast("bigint").alias("n_edges"),
            "sx",
            "sxx",
            "sxy",
            F.when(
                denom > 0,
                r6(
                    (F.col("m2") * F.col("sxy") - F.col("sx") * F.col("sx"))
                    .cast("double")
                    / denom.cast("double")
                ),
            ).alias("assortativity"),
        )
    )
