"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with Arrow-batched decode/feature-extract UDFs.

The container ships no image/audio codecs, so the *decode* step is
stubbed exactly as the task prescribes: ``decode_backend="fake"``
derives deterministic pseudo-pixels from the payload bytes themselves;
``decode_backend="pil"`` raises NotImplementedError unless PIL is
importable. Everything around the stub — schema, partitioning, UDF
signature, Arrow batch shape — is the real 100 TB design:

- payloads travel as one ``binary`` column next to a metadata struct
  (never exploded into rows);
- feature extraction is ``mapInPandas`` over Arrow batches, emitting
  fixed-width feature arrays;
- downstream similarity/dedup reuse the embedding operators
  (queries/similarity.py, queries/dedup.py) unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HIST_BUCKETS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_hist", T.ArrayType(T.LongType())),
    ]
)


def attach_fake_payload(df: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload: 256 bytes of iterated md5 over
    the text, plus a metadata struct — stands in for (image_bytes,
    {width,height,format}) until a real decoder exists."""
    payload = F.unhex(
        F.concat(*[F.md5(F.concat(F.col(text_col), F.lit(str(i)))) for i in range(16)])
    )
    meta = F.struct(
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit("fake-rgb").alias("format"),
    )
    return df.select(
        F.col(key_col), payload.alias("payload"), meta.alias("meta")
    )


def _fake_decode(payload: bytes) -> bytes:
    """The stub decode: the payload bytes ARE the pixels."""
    return payload


def _pil_decode(payload: bytes) -> bytes:
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL, which this environment does not "
            "ship; use decode_backend='fake'"
        ) from exc
    raise NotImplementedError("PIL decode path not wired yet")


_DECODERS = {"fake": _fake_decode, "pil": _pil_decode}


def extract_features(df: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the binary column: byte
    count, mean byte value, 16-bucket byte histogram. Partition-local;
    at scale the input stays columnar end to end."""
    decode = _DECODERS[decode_backend]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pixels = decode(bytes(r["payload"]))
                hist = [0] * N_HIST_BUCKETS
                total = 0
                for b in pixels:
                    hist[b * N_HIST_BUCKETS // 256] += 1
                    total += b
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "n_bytes": len(pixels),
                        "mean_byte": total / len(pixels) if pixels else 0.0,
                        "byte_hist": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 4) -> DataFrame:
    """Video-style frame sampling over the payload treated as a frame
    sequence (16-byte frames): keep every nth frame. Demonstrates the
    slice-inside-binary pattern without a codec."""
    frame_size = 16
    frames = F.transform(
        F.sequence(F.lit(0), (F.length("payload") / frame_size).cast("int") - 1),
        lambda i: F.substring(F.col("payload").cast("binary"), i * frame_size + 1, frame_size),
    )
    sampled = F.filter(frames, lambda f, i: i % every_nth == 0)
    return df.select("doc_id", sampled.alias("sampled_frames"))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize(df: DataFrame, out_width: int = 8, out_height: int = 8,
           decode_backend: str = "fake") -> DataFrame:
    """Image resize via average pooling over the decoded pixel buffer.

    The decode step is the same stub as extract_features; the pooling
    itself is real numpy over Arrow batches (vectorized, partition-local,
    no shuffle) — exactly the shape a PIL/libjpeg-backed resize takes at
    100 TB: binary in, binary out, fixed output size, mapInPandas."""
    import numpy as np

    decode = _DECODERS[decode_backend]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pixels = np.frombuffer(decode(bytes(r["payload"])), dtype=np.uint8)
                w = int(r["meta"]["width"])
                h = int(r["meta"]["height"])
                img = pixels[: w * h].reshape(h, w)
                bh, bw = h // out_height, w // out_width
                pooled = (
                    img[: out_height * bh, : out_width * bw]
                    .reshape(out_height, bh, out_width, bw)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "out_width": out_width,
                        "out_height": out_height,
                        "resized": pooled.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)
