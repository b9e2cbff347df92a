"""Pin the round-5 verdict fix: l_clean_funnel must run the iterative
min-label propagation (l_dedup_clusters) exactly ONCE per invocation.
The round-5 shape called l_cluster_representatives, which re-ran the
whole connected-components loop — doubling the funnel's most expensive
stage at scale."""

from __future__ import annotations

import bristle_spark.queries.corpus as corpus


def test_funnel_runs_propagation_once(spark, sf_dir, monkeypatch):
    calls = []
    real = corpus.l_dedup_clusters

    def counting(sp, sd):
        calls.append(sd)
        return real(sp, sd)

    monkeypatch.setattr(corpus, "l_dedup_clusters", counting)
    rows = corpus.l_clean_funnel(spark, sf_dir).collect()
    assert len(calls) == 1, f"propagation ran {len(calls)} times"
    assert len(rows) == 4


def test_representatives_match_registered_query(spark, sf_dir):
    """representatives_from over a precomputed clusters frame is
    row-identical to the registered l_cluster_representatives."""
    from bristle_spark.catalog import load_table

    clusters = corpus.l_dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    via_helper = sorted(
        tuple(r) for r in corpus.representatives_from(clusters, docs).collect()
    )
    via_query = sorted(
        tuple(r) for r in corpus.l_cluster_representatives(spark, sf_dir).collect()
    )
    assert via_helper == via_query
