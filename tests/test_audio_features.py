"""m_audio_features: chunked PCM16 feature extraction over fake audio
payloads. Pins (a) the batch shape (4 windows of 32 samples per 256-byte
payload, every doc covered), (b) feature ranges, (c) a hand-computed
numpy cross-check on one document, and (d) double-run determinism."""

from __future__ import annotations

import hashlib

import numpy as np

from bristle_spark.registry import all_specs


def _run(spark, sf_dir):
    return all_specs()["m_audio_features"].fn(spark, sf_dir)


def _fake_payload(text: str) -> bytes:
    return b"".join(
        hashlib.md5((text + str(i)).encode()).digest() for i in range(16)
    )


def test_shape_and_ranges(spark, sf_dir):
    pdf = _run(spark, sf_dir).toPandas()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(pdf) == n_docs * 4
    assert (pdf.groupby("doc_id").size() == 4).all()
    assert (pdf["n_samples"] == 32).all()
    assert (pdf["rms"] >= 0).all()
    assert pdf["peak"].between(0, 32768).all()
    assert pdf["zcr"].between(0.0, 1.0).all()


def test_matches_hand_computed_numpy(spark, sf_dir):
    doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    x = np.frombuffer(_fake_payload(doc.text), dtype="<i2").reshape(4, 32)
    xf = x.astype(np.float64)
    want_rms = np.round(np.sqrt((xf * xf).mean(axis=1)), 6)
    want_peak = np.abs(x.astype(np.int64)).max(axis=1)
    want_zcr = np.round(((xf[:, 1:] * xf[:, :-1]) < 0).sum(axis=1) / 31, 6)
    got = (
        _run(spark, sf_dir)
        .filter(f"doc_id = {doc.doc_id}")
        .orderBy("chunk_idx")
        .toPandas()
    )
    assert np.allclose(got["rms"].to_numpy(), want_rms)
    assert (got["peak"].to_numpy() == want_peak).all()
    assert np.allclose(got["zcr"].to_numpy(), want_zcr)


def test_double_run_identical(spark, sf_dir):
    a = _run(spark, sf_dir).toPandas()
    b = _run(spark, sf_dir).toPandas()
    assert a.equals(b)
