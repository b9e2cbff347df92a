"""No registered batch query may plan a partition-less WindowExec.

An unpartitioned ``Window.orderBy(...)`` moves EVERY input row to one
partition ("No Partition Defined for Window operation" in the executor
log) — the canonical 100 TB scale-killer. Top-k must be
``orderBy(...).limit(k)`` (TakeOrderedAndProject: per-partition top-k,
k-row merge) and global aggregates a broadcast 1-row join.

Streaming-group queries (``s_*``) are excluded: their fn() executes a
stream and returns a small collected-result frame, so there is no batch
plan worth pinning (and the canonicalizer-safety sweep already runs
them).
"""

from __future__ import annotations

import pytest

from bristle_spark import plans
from bristle_spark.registry import all_specs

_SPECS = {n: s for n, s in all_specs().items() if s.group != "s"}


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_no_unpartitioned_window(spark, sf_dir, name):
    df = _SPECS[name].fn(spark, sf_dir)
    offenders = plans.unpartitioned_windows(df)
    assert not offenders, (
        f"{name} plans a partition-less WindowExec (single-partition "
        f"funnel at scale): {offenders}"
    )


def test_similarity_topk_is_take_ordered(spark, sf_dir):
    """The five former global-window top-k queries must now plan
    TakeOrderedAndProject."""
    for name in (
        "l_similarity_cosine",
        "l_knn_label",
        "l_ann_lsh",
        "l_ann_ivf",
        "l_dedup_embedding",
    ):
        df = all_specs()[name].fn(spark, sf_dir)
        assert plans.has_node(df, "TakeOrderedAndProject"), name
