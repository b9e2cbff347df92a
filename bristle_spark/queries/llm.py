"""Group L core — LLM-data-pipeline declared queries: exact dedup and
text statistics over the ``documents`` table (SURVEY.md §2.D Group L).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bristle_spark.catalog import load_table
from bristle_spark.registry import register


@register(
    "l_dedup_exact",
    oracle="""
    SELECT doc_id, text, lang, source FROM (
        SELECT doc_id, text, lang, source,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)
def l_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup, keep-first by doc_id.

    Implemented as a window row_number over the full text. At 100 TB one
    would partition on a hash/fingerprint of the text instead of the raw
    text bytes (same shuffle key cardinality, tiny shuffle payload) —
    see l_fingerprint for the fingerprint primitive."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.select("doc_id", "text", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "l_text_stats",
    oracle="""
    SELECT lang,
           count(*)                                              AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)     AS total_tokens,
           round(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6) AS avg_tokens,
           CAST(min(n_chars) AS BIGINT)                          AS min_chars,
           CAST(max(n_chars) AS BIGINT)                          AS max_chars,
           round(avg(CAST(n_chars AS DOUBLE)), 6)                AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def l_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts and char-length stats per language (whitespace
    tokenization; integer sums are exact so the oracle matches bitwise)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.round(F.avg(n_tok.cast("double")), 6).alias("avg_tokens"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
    )
