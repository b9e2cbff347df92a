"""Group L core — LLM-data-pipeline declared queries: exact dedup and
text statistics over the ``documents`` table (SURVEY.md §2.D Group L).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bristle_spark.catalog import load_table
from bristle_spark.functions.rounding import r6, r6_sql
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

    Scale form: a plain groupBy(fp, text) hash aggregate. The partial
    (map-side) aggregate dedups each partition BEFORE the exchange, so
    only one surviving row per distinct text crosses the wire; grouping
    by the 64-bit fingerprint first keeps the hash-table key cheap while
    the text column in the key is the exact-compare guard against fp
    collisions. The keep-first row is min / min_by — a hash aggregate,
    never a window sort over long strings."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", "text", "lang", "source", F.xxhash64("text").alias("fp")
    )
    return (
        keyed.groupBy("fp", "text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("source", "doc_id").alias("source"),
        )
        .select("doc_id", "text", "lang", "source")
    )


@register(
    "l_text_stats",
    oracle=f"""
    SELECT lang,
           count(*)                                              AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)     AS total_tokens,
           {r6_sql("avg(CAST(len(string_split(text, ' ')) AS DOUBLE))")} AS avg_tokens,
           CAST(min(n_chars) AS BIGINT)                          AS min_chars,
           CAST(max(n_chars) AS BIGINT)                          AS max_chars,
           {r6_sql("avg(CAST(n_chars AS DOUBLE))")}              AS avg_chars
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
        r6(F.avg(n_tok.cast("double"))).alias("avg_tokens"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        r6(F.avg(F.col("n_chars").cast("double"))).alias("avg_chars"),
    )
