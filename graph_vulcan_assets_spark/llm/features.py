"""Feature hashing + fixed-codebook topic assignment.

The hashing trick (Weinberger et al. 2009) turns unbounded vocabulary
into a FIXED feature space with no dictionary to build, broadcast, or
version — the property that makes it the default text featurizer at
corpus scale. Features stay in LONG form (doc_id, dim, cnt): sparse,
shuffle-friendly, joinable — never a per-doc dense array until a consumer
wants one.

Topic assignment scores the sparse features against a topic codebook
(topics × dims weight table) — the matrix-product shape every
model-scoring pipeline reduces to: features ⋈ codebook on dim, partial-agg
per (doc, topic), argmax per doc via max_by. The codebook here is
md5-derived (integer-exact on both engines, the llm/quality.py bridge) so
the whole path is oracle-checked; a real trained codebook swaps in as a
broadcast table without touching the plan shape.

Determinism notes: dims come from the md5 bridge (not xxhash64 — DuckDB
lacks it); distances are exact BIGINT sums of squares; argmin ties break
toward the lowest topic id via min_by on (distance, topic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.functions.scalars import md5_prefix_long
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

N_DIMS = 64
N_TOPICS = 8
# topic-weight range: prime modulus, same debiasing rationale as
# llm/quality.py's token weights
_WMOD = 23
_WSHIFT = 11


def _dim_of(term: Column) -> Column:
    h = md5_prefix_long(term)
    return h % N_DIMS


def hashed_features(docs: DataFrame) -> DataFrame:
    """(doc_id, dim, cnt): token counts folded into N_DIMS hashed dims."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term")).where(
        F.length("term") > 0
    )
    return (
        tok.withColumn("dim", _dim_of(F.col("term")))
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def topic_codebook(spark: SparkSession) -> DataFrame:
    """(topic, dim, w): the fixed md5-derived codebook, topics × dims rows
    — constant-size however large the corpus; Spark broadcasts it."""
    return spark.range(N_TOPICS).select(
        F.col("id").alias("topic"),
        F.explode(F.sequence(F.lit(0), F.lit(N_DIMS - 1))).alias("dim"),
    ).select(
        "topic",
        "dim",
        (
            md5_prefix_long(F.concat_ws(":", "topic", "dim")) % _WMOD - _WSHIFT
        ).alias("w"),
    )


def assign_topics(features: DataFrame, codebook: DataFrame) -> DataFrame:
    """argmin_topic Σ_dim (cnt - w)² per doc, exact integer arithmetic.

    Missing dims contribute w² (cnt = 0 there), so each (doc, topic)
    distance = Σ_all w² + Σ_present (cnt² - 2·cnt·w): the constant
    Σ_all w² per topic attaches via the broadcast codebook norms and the
    data-dependent part only ever touches PRESENT dims — the sparse-score
    trick that keeps the join linear in nonzeros, not docs × dims.
    """
    norms = codebook.groupBy("topic").agg(F.sum(F.col("w") * F.col("w")).alias("w2"))
    present = (
        features.join(F.broadcast(codebook), "dim")
        .groupBy("doc_id", "topic")
        .agg(
            F.sum(
                F.col("cnt") * F.col("cnt") - 2 * F.col("cnt") * F.col("w")
            ).alias("part")
        )
    )
    scored = present.join(F.broadcast(norms), "topic").select(
        "doc_id", "topic", (F.col("part") + F.col("w2")).alias("dist2")
    )
    best = F.min_by(F.struct("topic", "dist2"), F.struct("dist2", "topic"))
    return (
        scored.groupBy("doc_id")
        .agg(best.alias("b"))
        .select("doc_id", F.col("b.topic").alias("topic"), F.col("b.dist2").alias("dist2"))
    )


@query(
    "q_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dims AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 64 AS dim
      FROM tok WHERE len(term) > 0)
    SELECT doc_id, dim, CAST(count(*) AS BIGINT) AS cnt
    FROM dims GROUP BY doc_id, dim
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick features in long form — the dictionary-free text
    featurizer (no vocab build, no broadcast model, fixed width)."""
    d = load_table(spark, sf_dir, "documents")
    return hashed_features(d)


@query(
    "q_topic_assign",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    feats AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 64 AS dim,
             count(*) AS cnt
      FROM tok WHERE len(term) > 0 GROUP BY 1, 2),
    code AS (
      SELECT t.topic, d.dim,
             CAST('0x' || substr(md5(t.topic || ':' || d.dim), 1, 8) AS BIGINT)
               % 23 - 11 AS w
      FROM unnest(range(0, 8)) AS t(topic), unnest(range(0, 64)) AS d(dim)),
    norms AS (SELECT topic, sum(w * w) AS w2 FROM code GROUP BY topic),
    present AS (
      SELECT doc_id, topic, sum(cnt * cnt - 2 * cnt * w) AS part
      FROM feats JOIN code USING (dim) GROUP BY doc_id, topic),
    scored AS (
      SELECT doc_id, topic, part + w2 AS dist2
      FROM present JOIN norms USING (topic)),
    ranked AS (
      SELECT doc_id, topic, dist2,
             row_number() OVER (PARTITION BY doc_id ORDER BY dist2, topic) AS rn
      FROM scored)
    SELECT doc_id, CAST(topic AS BIGINT) AS topic, CAST(dist2 AS BIGINT) AS dist2
    FROM ranked WHERE rn = 1
    """,
)
def q_topic_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-codebook topic per document over hashed features — the
    model-scoring matrix-product shape, exact integers end to end."""
    d = load_table(spark, sf_dir, "documents")
    return assign_topics(hashed_features(d), topic_codebook(spark))
