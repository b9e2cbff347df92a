"""l_ann_pq: the PQ/ADC pipeline must (a) re-rank its candidate pool
exactly, and (b) recover a meaningful share of the true top-10 through
4-byte codes alone — on unstructured random 64-dim embeddings with a
16-donor codebook this sits well above chance (10 of N by luck ≈ 0).
"""

from __future__ import annotations

from bristle_spark.registry import all_specs

SPECS = all_specs()


def test_pq_recall_against_exact(spark, sf_dir):
    exact = [r["vec_id"] for r in SPECS["l_similarity_cosine"].fn(spark, sf_dir).collect()]
    pq_rows = SPECS["l_ann_pq"].fn(spark, sf_dir).collect()
    pq = [r["vec_id"] for r in pq_rows]
    assert len(pq) == 10
    recall = len(set(exact) & set(pq)) / 10
    assert recall >= 0.4, f"PQ recall@10 {recall} below floor"
    # within the returned set the ordering must be exact-cosine order
    sims = [r["cos_sim"] for r in pq_rows]
    assert sims == sorted(sims, reverse=True)


def test_pq_codes_are_valid_and_complete(spark, sf_dir):
    """Every non-probe vector gets exactly PQ_M codes, each pointing at
    a real codebook entry."""
    from pyspark.sql import functions as F

    from bristle_spark.queries.similarity import PQ_K, PQ_M, _embeddings

    e = _embeddings(spark, sf_dir)
    n_vec = e.count()
    # rebuild the code table the query uses (same helpers)
    from bristle_spark.queries import similarity as S

    cent = e.filter(F.col("vec_id").between(1, PQ_K)).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    def sub_d2(v, cv, m):
        def step(acc, j):
            diff = F.element_at(v, m * S.PQ_SUB + j) - F.element_at(cv, m * S.PQ_SUB + j)
            return acc + diff * diff

        return F.round(F.aggregate(F.sequence(F.lit(1), F.lit(S.PQ_SUB)), F.lit(0.0), step), 6)

    d2s = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: sub_d2(F.col("v"), F.col("cv"), m),
    )
    codes = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", F.posexplode(d2s).alias("m", "d2"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "cid")).alias("best"))
        .select("vec_id", "m", F.col("best.cid").alias("code"))
    )
    stats = codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
    ).collect()[0]
    assert stats["n"] == n_vec * PQ_M
    assert 1 <= stats["lo"] and stats["hi"] <= PQ_K
