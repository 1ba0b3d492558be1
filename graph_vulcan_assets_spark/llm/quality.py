"""Model-based quality scoring: hashed linear classifier (SURVEY.md §2.16).

The fastText-shaped filter used by every large corpus pipeline (CCNet,
RefinedWeb, FineWeb): score = Σ weight[hash(token)] over the document's
tokens, keep if the score clears a threshold, then route documents into
quality bands for mixture construction. The heuristic quality scores in
``llm/text.py`` (q_text_quality) are rule-based; this is the *learned-
model application* path — the model is a hash-indexed weight vector, so
applying it is pure relational work: explode → hash → weight lookup →
per-doc sum.

No trained model ships in this image, so weights are derived
deterministically from the token's md5 (uniform in [-999, 999]); the
*application machinery* — feature hashing, per-doc reduction, threshold
gate, band routing — is exactly what a real exported linear model needs,
with the weight expression swapped for a broadcast weight-table join.

Why integers: weights are BIGINT, so the per-doc sum is exact and
summation-order-independent — bit-identical between Spark (any partition
count) and the DuckDB oracle. The hash bridge is the engine-portable
md5 prefix: Spark ``conv(substring(md5(t),1,8),16,10)`` ==
DuckDB ``CAST('0x'||substr(md5(t),1,8) AS BIGINT)``.

Scale shape: one explode + one groupBy(doc_id) — the shuffle carries
(doc_id, weight) pairs, never text. With a real model the weight lookup
is a broadcast join against a vocabulary-sized table; here the weight is
computed inline, which is strictly cheaper. Reference has no scoring
surface (it's a streaming ETL); this extends the X4 text-analysis family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# 1999 is prime → the md5-uniform hash maps onto [-999, 999] without bias
# toward any residue class.
_MOD = 1999
_SHIFT = 999
# band edges for q_classifier_route (CASE thresholds, no integer division
# — Spark and DuckDB disagree on negative integer-division flavor).
_LOW, _HIGH = -5000, 5000


def _token_weight(term: Column) -> Column:
    """Deterministic pseudo-weight in [-999, 999] from the token's md5.

    Stand-in for ``weight_table[hash(token) % buckets]``; both engines
    compute the identical BIGINT, so every downstream sum is exact.
    """
    from graph_vulcan_assets_spark.functions.scalars import md5_prefix_long

    h = md5_prefix_long(term)
    return (h % _MOD) - _SHIFT


_WEIGHT_SQL = (
    f"(CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % {_MOD}) - {_SHIFT}"
)


def classifier_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, logit, keep): the linear model applied per doc."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return (
        tok.withColumn("wt", _token_weight(F.col("term")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("wt").alias("logit"),
        )
        .withColumn("keep", F.col("logit") >= 0)
    )


@query(
    "q_quality_classifier",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    scored AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             CAST(sum({_WEIGHT_SQL}) AS BIGINT) AS logit
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, logit, (logit >= 0) AS keep FROM scored
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier over documents (X4 extension).

    Exact-integer logits: driver hash-compare is bit-for-bit at any
    partition count.
    """
    d = load_table(spark, sf_dir, "documents")
    return classifier_scores(d)


@query(
    "q_classifier_route",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    scored AS (
      SELECT doc_id, CAST(sum({_WEIGHT_SQL}) AS BIGINT) AS logit
      FROM tok GROUP BY doc_id
    ),
    banded AS (
      SELECT d.source,
             CASE WHEN s.logit < {_LOW} THEN 0
                  WHEN s.logit < 0 THEN 1
                  WHEN s.logit < {_HIGH} THEN 2
                  ELSE 3 END AS band
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT source, band, count(*) AS n_docs
    FROM banded GROUP BY source, band
    """,
)
def q_classifier_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-band routing (X4 extension): per-source band histogram.

    The downstream-mixture view of the classifier: how much of each
    source lands in each quality band. Bands are CASE thresholds on the
    exact logit (no integer division — engines disagree on negative
    division flavor). Two shuffles: the per-doc score reduction, then a
    (source, band) count whose input is one row per doc.
    """
    d = load_table(spark, sf_dir, "documents")
    scores = classifier_scores(d)
    band = (
        F.when(F.col("logit") < _LOW, 0)
        .when(F.col("logit") < 0, 1)
        .when(F.col("logit") < _HIGH, 2)
        .otherwise(3)
    )
    return (
        scores.join(d.select("doc_id", "source"), "doc_id")
        .withColumn("band", band)
        .groupBy("source", "band")
        .agg(F.count("*").alias("n_docs"))
    )


def vocab_weights(docs: DataFrame) -> DataFrame:
    """(term, wt): the corpus vocabulary scored by the hash family — the
    shape a real exported linear model ships in (vocabulary-sized, tiny
    relative to the corpus)."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .distinct()
        .select("term", _token_weight(F.col("term")).alias("wt"))
    )


def classifier_scores_with_model(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """The production application path: per-token weight LOOKUP against a
    broadcast weight table instead of inline derivation.

    Same output contract as :func:`classifier_scores`; out-of-vocabulary
    tokens score 0 (the left join's null coalesced), which is also what a
    hashed-but-pruned exported model does. The weight table broadcasts —
    the corpus-sized side never shuffles. `tests/test_quality.py` pins
    that, when the table covers the vocabulary, this path is bit-identical
    to the inline derivation.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return (
        tok.join(F.broadcast(weights), "term", "left")
        .withColumn("wt", F.coalesce(F.col("wt"), F.lit(0)))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("wt").alias("logit"),
        )
        .withColumn("keep", F.col("logit") >= 0)
    )
