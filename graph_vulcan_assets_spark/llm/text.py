"""Text analysis operators (X4/X5): token stats, search, quality scoring,
language distribution, fingerprinting.

Everything is built-in string/regex/array expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens,
           round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars
    FROM documents GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language (X4): token counts + char stats."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(n_tokens.cast("double")), 4).alias("avg_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.max(n_tokens).cast("long").alias("max_tokens"),
        F.min("n_chars").cast("long").alias("min_chars"),
    )


@query(
    "q_text_search",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE text LIKE '%join%' AND regexp_matches(text, 'merge|window')
    """,
)
def q_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text search (X5): LIKE + regex predicate over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.where(
        F.col("text").like("%join%") & F.col("text").rlike("merge|window")
    ).select("doc_id", "lang", "n_chars")


@query(
    "q_text_quality",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             n_chars,
             CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
                  ELSE CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))
             END AS chars_per_token,
             CAST(len(text) - len(replace(text, 'the', ''))
                  AS DOUBLE) / 3 AS stopword_hits
      FROM documents)
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(chars_per_token, 4) AS chars_per_token,
           CAST(stopword_hits AS BIGINT) AS stopword_hits,
           n_tokens >= 20 AND chars_per_token BETWEEN 2 AND 12 AS passes_quality
    FROM scored
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (X4 extension): length / density / stopword heuristics.

    The standard pre-training quality gate shape: cheap per-document
    features plus a boolean pass/fail — all scans, no shuffle at all.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    chars_per_token = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.col("n_chars").cast("double") / n_tokens
    )
    stopword_hits = (
        (F.length("text") - F.length(F.expr("replace(text, 'the', '')"))) / 3
    ).cast("long")
    return d.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(chars_per_token, 4).alias("chars_per_token"),
        stopword_hits.alias("stopword_hits"),
        ((n_tokens >= 20) & chars_per_token.between(2, 12)).alias("passes_quality"),
    )


@query(
    "q_text_lang_dist",
    oracle="""
    SELECT lang, source, count(*) AS n,
           round(100.0 * count(*) / sum(count(*)) OVER (PARTITION BY source), 4)
             AS pct_of_source
    FROM documents GROUP BY lang, source
    """,
)
def q_text_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language distribution per source (X4): agg + window over agg."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    agg = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source")
    return agg.select(
        "lang",
        "source",
        "n",
        F.round(100.0 * F.col("n") / F.sum("n").over(w), 4).alias("pct_of_source"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fingerprint,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (X4): canonicalize + hash.

    MD5 of the canonicalized text — both engines implement RFC-1321 MD5 so
    the digests match exactly; the canonical form (lower+trim) is where
    dedup pipelines normalize whitespace/case.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
