"""l_ivf_train_kmeans must match a numpy Lloyd reference: same
deterministic init (pinned donors), same rounded-argmin assignment rule,
same empty-cluster handling, same iteration count."""

from __future__ import annotations

import numpy as np
import pytest

from bristle_spark.queries.similarity import IVF_CENTROIDS, KMEANS_ITERS
from bristle_spark.registry import all_specs


def _reference(ids: np.ndarray, x: np.ndarray, k: int, iters: int):
    donor = {int(i): x[j] for j, i in enumerate(ids)}
    cents = np.stack([donor[c] for c in range(1, k + 1)])
    for _ in range(iters):
        d2 = np.round(((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6)
        assign = d2.argmin(axis=1)  # ties -> lowest cid (argmin keeps first)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d2 = np.round(((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6)
    assign = d2.argmin(axis=1)
    sizes = np.bincount(assign, minlength=k)
    return cents, sizes


def test_matches_numpy_lloyd(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cents, sizes = _reference(ids, x, IVF_CENTROIDS, KMEANS_ITERS)
    got = all_specs()["l_ivf_train_kmeans"].fn(spark, sf_dir).collect()
    assert len(got) == IVF_CENTROIDS * x.shape[1]
    by_key = {(r["cid"], r["pos"]): r for r in got}
    for c in range(1, IVF_CENTROIDS + 1):
        assert by_key[(c, 1)]["n_members"] == sizes[c - 1], f"cid {c} size"
        for p in range(1, x.shape[1] + 1):
            assert by_key[(c, p)]["centroid"] == pytest.approx(
                round(cents[c - 1][p - 1], 6), abs=2e-6
            ), f"cid {c} pos {p}"
