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
    graph, BOTH directions per undirected pair. One inverted-index
    self-join on the 8-byte shingle hash (id-only shuffle), distinct'd
    on the (src, dst) pair."""
    d = _tokens(load_table(spark, sf_dir, "documents"))
    # df cap via count window (one corpus pass, r15 optimization) and
    # persist: the self-join consumes the pruned postings on BOTH sides
    sh_rare = _rare_shingle_hashes(d).persist()
    a, b = sh_rare.alias("a"), sh_rare.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.hs") == F.col("b.hs"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .distinct()
    )
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
    persisted; each round is (1) a corpus-keyed join of ranks to edges
    + a dst-keyed map-side-combined sum — the only two shuffles, both
    on doc_id, both reusing the same partitioning round over round —
    and (2) a 1-row dangling-mass aggregate broadcast back; ranks are
    localCheckpoint'd so lineage stays O(1). At 100 TB the edge list
    is the big table and every shuffle is keyed on doc ids — no
    vertex-count-squared term anywhere. Rows-only (iterative float
    trajectory has no SQL oracle); pinned to a numpy power-iteration
    reference in tests/test_pagerank.py."""
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

    pr = verts.select("doc_id", "deg", F.lit(1.0 / n_docs).alias("pr"))
    for _ in range(PAGERANK_ITERS):
        dangling = pr.filter(F.col("deg") == 0).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            pr.filter(F.col("deg") > 0)
            .join(edges, pr.doc_id == edges.src)
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            verts.join(contrib, verts.doc_id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "doc_id",
                "deg",
                (
                    F.lit((1.0 - PAGERANK_D) / n_docs)
                    + PAGERANK_D
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dm") / n_docs
                    )
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return (
        pr.select(
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
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", F.split("text", " "))
        .filter(F.size("t") >= TRI_SHINGLE_WORDS)
    )
    # df cap via count window (one corpus pass, r15 optimization);
    # persisted because the self-join consumes it on both sides
    shr = _rare_shingle_hashes(d, k=TRI_SHINGLE_WORDS).persist()
    ea, eb = shr.alias("ea"), shr.alias("eb")
    half = (
        ea.join(
            eb,
            (F.col("ea.hs") == F.col("eb.hs"))
            & (F.col("ea.doc_id") < F.col("eb.doc_id")),
        )
        .select(F.col("ea.doc_id").alias("u"), F.col("eb.doc_id").alias("v"))
        .distinct()
        # the edge list feeds deg AND the orientation join; without the
        # persist the df-capped inverted-index self-join re-runs once
        # per downstream scan (measured 5.9s -> 2s at sf0.1)
        .persist()
    )
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
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", F.split("text", " "))
        .filter(F.size("t") >= TRI_SHINGLE_WORDS)
    )
    # df cap via count window (one corpus pass, r15 optimization);
    # persisted because the self-join consumes it on both sides
    shr = _rare_shingle_hashes(d, k=TRI_SHINGLE_WORDS).persist()
    ea, eb = shr.alias("ea"), shr.alias("eb")
    half = (
        ea.join(
            eb,
            (F.col("ea.hs") == F.col("eb.hs"))
            & (F.col("ea.doc_id") < F.col("eb.doc_id")),
        )
        .select(F.col("ea.doc_id").alias("u"), F.col("eb.doc_id").alias("v"))
        .distinct()
        # feeds deg AND the endpoint join: persist so the df-capped
        # inverted-index self-join runs once (the triangle discipline)
        .persist()
    )
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
