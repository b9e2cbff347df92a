"""Group L (multimodal) — rows-only queries exercising the binary-column
plumbing: deterministic fake payloads, Arrow-batched feature extraction,
frame sampling. No SQL oracle (binary feature extraction is not
SQL-expressible); the driver records the rows-only check and the unit
tests assert determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bristle_spark import multimodal
from bristle_spark.catalog import load_table
from bristle_spark.registry import register


@register("m_binary_features", oracle=None)
def m_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload -> mapInPandas feature extraction (byte stats +
    histogram), joined back to doc metadata."""
    d = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_fake_payload(d)
    feats = multimodal.extract_features(payloads, decode_backend="fake")
    return (
        feats.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_bytes",
            F.round("mean_byte", 6).alias("mean_byte"),
            # serialized for the driver's pandas canonicalizer (raw list
            # cells are unsortable/unhashable there)
            F.array_join(
                F.transform("byte_hist", lambda x: x.cast("string")), ","
            ).alias("byte_hist"),
        )
        .orderBy("doc_id")
    )


@register("m_frame_sample", oracle=None)
def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling inside a binary payload (every 4th 16-byte frame)."""
    d = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_fake_payload(d)
    sampled = multimodal.sample_frames(payloads, every_nth=4)
    return sampled.select(
        "doc_id",
        F.size("sampled_frames").cast("bigint").alias("n_frames"),
        F.md5(F.col("sampled_frames").getItem(0)).alias("first_frame_md5"),
    ).orderBy("doc_id")


@register("m_resize", oracle=None)
def m_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16x16 fake image -> 8x8 average-pooled resize (the mapInPandas
    binary->binary shape of a real image-resize stage)."""
    d = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_fake_payload(d)
    resized = multimodal.resize(payloads, out_width=8, out_height=8)
    return resized.select(
        "doc_id",
        "out_width",
        "out_height",
        F.length("resized").cast("bigint").alias("n_bytes"),
        F.md5("resized").alias("resized_md5"),
    ).orderBy("doc_id")
