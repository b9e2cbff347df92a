"""l_quality_classifier_train must match a numpy full-batch GD
reference: same features, same box-rule pseudo-label, same zero init,
same fixed iteration count and learning rate."""

from __future__ import annotations

import numpy as np
import pytest

from bristle_spark.queries.corpus import LOGREG_DIM, LOGREG_ITERS, LOGREG_LR
from bristle_spark.registry import all_specs


def _features(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    xs, ys = [], []
    for t in texts:
        toks = t.split(" ")
        nw = float(len(toks))
        ttr = len(set(toks)) / nw
        awl = sum(len(w) for w in toks) / nw
        stopf = sum(1 for w in toks if w in ("the", "a")) / nw
        xs.append([1.0, nw / 50.0, ttr, awl / 5.0, stopf * 10.0])
        ys.append(1.0 if (40 <= len(toks) <= 80 and ttr >= 0.5) else 0.0)
    return np.array(xs), np.array(ys)


def _reference(x: np.ndarray, y: np.ndarray):
    w = np.zeros(LOGREG_DIM)
    n = len(y)
    for _ in range(LOGREG_ITERS):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        w = w - LOGREG_LR * (x.T @ (p - y)) / n
    acc = float(((x @ w >= 0).astype(float) == y).mean())
    return w, acc, float(y.mean())


def test_matches_numpy_gd(spark, sf_dir):
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    x, y = _features(texts)
    w_ref, acc_ref, pos_ref = _reference(x, y)
    got = all_specs()["l_quality_classifier_train"].fn(spark, sf_dir).collect()
    assert len(got) == LOGREG_DIM
    assert 0.0 < got[0]["pos_rate"] < 1.0  # mixed classes on the fixture
    for r in got:
        assert r["weight"] == pytest.approx(
            round(w_ref[r["pos"] - 1], 6), abs=2e-6
        ), f"pos {r['pos']}"
        assert r["train_acc"] == pytest.approx(round(acc_ref, 6), abs=2e-6)
        assert r["pos_rate"] == pytest.approx(round(pos_ref, 6), abs=2e-6)
