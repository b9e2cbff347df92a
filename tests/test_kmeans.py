"""The Lloyd trainer behind l_ivf_train_kmeans must match a numpy
reference: same deterministic init (pinned donors), same rounded-argmin
assignment rule, same empty-cluster handling, same iteration count.
Since r15 the registered key grades the trainer by CONTRACT (init
assignment replayed by DuckDB + monotone-improvement flag); the numpy
pin here covers the trained centroids themselves via
kmeans_centroid_frame, and test_contract_flags_from_reference checks
the contract columns against the same reference."""

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
    from bristle_spark.queries.similarity import kmeans_centroid_frame

    got = kmeans_centroid_frame(spark, sf_dir).collect()
    assert len(got) == IVF_CENTROIDS * x.shape[1]
    by_key = {(r["cid"], r["pos"]): r for r in got}
    for c in range(1, IVF_CENTROIDS + 1):
        assert by_key[(c, 1)]["n_members"] == sizes[c - 1], f"cid {c} size"
        for p in range(1, x.shape[1] + 1):
            assert by_key[(c, p)]["centroid"] == pytest.approx(
                round(cents[c - 1][p - 1], 6), abs=2e-6
            ), f"cid {c} pos {p}"


def test_contract_flags_from_reference(spark, sf_dir):
    """The registered contract key: init member counts and micro-unit
    init inertia must equal the numpy replay; both flags must be 1 and
    the reference's own trained inertia must confirm `improved` is a
    real monotone-decrease witness, not a constant."""
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    k = IVF_CENTROIDS
    donor = {int(i): x[j] for j, i in enumerate(ids)}
    cents0 = np.stack([donor[c] for c in range(1, k + 1)])

    def _min_d2(cents):
        d2 = np.round(((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6)
        assign = d2.argmin(axis=1)
        micro = np.floor(d2[np.arange(len(x)), assign] * 1e6 + 0.5).astype(np.int64)
        return assign, micro

    a0, m0 = _min_d2(cents0)
    got = {r["cid"]: r for r in
           all_specs()["l_ivf_train_kmeans"].fn(spark, sf_dir).collect()}
    assert len(got) == k
    for c in range(1, k + 1):
        sel = a0 == (c - 1)
        assert got[c]["n_members_init"] == int(sel.sum()), f"cid {c}"
        assert got[c]["inertia_init_micro"] == int(m0[sel].sum()), f"cid {c}"
        assert got[c]["counts_complete"] == 1
        assert got[c]["improved"] == 1
    cents_t, _ = _reference(ids, x, k, KMEANS_ITERS)
    _, mt = _min_d2(cents_t)
    assert mt.sum() <= m0.sum()  # the flag witnesses a real decrease
