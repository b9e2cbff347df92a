"""m_png_phash_dedup: perceptual-hash near-dup detection over planted image
variants. Pins (a) recall inside the planted canonical groups, (b) zero
cross-group false positives, (c) double-run determinism, and (d) the
banded plan never degenerates into an all-pairs product."""

from __future__ import annotations

from bristle_spark import plans
from bristle_spark.registry import all_specs
from tests.conftest import canon_frame


def _run(spark, sf_dir):
    return all_specs()["m_png_phash_dedup"].fn(spark, sf_dir)


def test_pairs_are_within_planted_groups(spark, sf_dir):
    rows = _run(spark, sf_dir).collect()
    assert rows, "no near-dup pairs found"
    assert all(r["doc_a"] // 4 == r["doc_b"] // 4 for r in rows), (
        "cross-group false positive"
    )
    assert all(r["hamming"] <= 3 for r in rows)
    # near-total recall: each group of 4 variants has 6 pairs; a couple
    # may legitimately exceed the Hamming cut from the planted noise
    groups = {r["doc_a"] // 4 for r in rows}
    assert len(rows) >= 5 * len(groups), "recall collapsed"


def test_double_run_identical(spark, sf_dir):
    a = canon_frame(_run(spark, sf_dir).toPandas())
    b = canon_frame(_run(spark, sf_dir).toPandas())
    assert a == b


def test_plan_is_banded_not_all_pairs(spark, sf_dir):
    df = _run(spark, sf_dir)
    assert not plans.has_node(df, "CartesianProduct")
    assert not plans.has_node(df, "BroadcastNestedLoopJoin")
