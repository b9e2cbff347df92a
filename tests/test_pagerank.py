"""l_pagerank must match a numpy power-iteration reference on the SAME
edge list: same uniform init, same damping, same dangling-mass
redistribution, same fixed round count. The edge derivation itself is
oracle-checked transitively (it is l_dedup_ngram_jaccard's candidate
generator); this pin covers the iterative PageRank math."""

from __future__ import annotations

import numpy as np
import pytest

from bristle_spark.queries.graph import PAGERANK_D, PAGERANK_ITERS, PAGERANK_TOP
from bristle_spark.registry import all_specs


def _reference(doc_ids: list[int], edges: list[tuple[int, int]]):
    idx = {d: i for i, d in enumerate(doc_ids)}
    n = len(doc_ids)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(PAGERANK_ITERS):
        dm = pr[deg == 0].sum()
        inflow = np.zeros(n)
        for s, t in edges:
            inflow[idx[t]] += pr[idx[s]] / deg[idx[s]]
        pr = (1.0 - PAGERANK_D) / n + PAGERANK_D * (inflow + dm / n)
    return pr, deg


def test_matches_numpy_power_iteration(spark, sf_dir):
    from bristle_spark.queries.graph import doc_graph_edges

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = [
        (r["src"], r["dst"]) for r in doc_graph_edges(spark, sf_dir).collect()
    ]
    assert edges, "fixture graph must not be empty"
    pr_ref, deg_ref = _reference(doc_ids, edges)
    idx = {d: i for i, d in enumerate(doc_ids)}

    got = all_specs()["l_pagerank"].fn(spark, sf_dir).collect()
    assert len(got) == min(PAGERANK_TOP, len(doc_ids))
    # the sum over ALL vertices is 1 by construction; the top slice must
    # match the reference values and ordering
    order = sorted(range(len(doc_ids)), key=lambda i: (-round(pr_ref[i], 6), doc_ids[i]))
    for r, i in zip(got, order[: len(got)]):
        assert r["doc_id"] == doc_ids[i]
        assert r["degree"] == int(deg_ref[i])
        assert r["pagerank"] == pytest.approx(round(pr_ref[i], 6), abs=2e-6)
