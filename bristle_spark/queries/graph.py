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
from bristle_spark.functions.hashing import hash60
from bristle_spark.queries.dedup import MAX_SHINGLE_DF, _shingle_rows, _tokens
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
    sh = _shingle_rows(d).select("doc_id", hash60(F.col("s")).alias("hs"))
    rare = (
        sh.groupBy("hs")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .select("hs")
    )
    sh_rare = sh.join(rare, "hs")
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
