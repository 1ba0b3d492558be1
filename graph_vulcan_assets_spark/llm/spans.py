"""Exact-substring span deduplication (X2 family extension).

Doc-level dedup (q_dedup_exact / q_dedup_near) misses the common failure
mode of web corpora: two DIFFERENT pages sharing a long identical passage
(licenses, navigation chrome, syndicated paragraphs). Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better") remove exact
substring duplicates of >= 50 tokens with a suffix array; a suffix array is
a single global sorted structure and does not shard naturally, so the
distributed re-expression here is the k-gram fingerprint form of the same
idea:

  tokenize -> k-gram starts -> hash each gram ONCE (xxhash64) ->
  grams seen in >= 2 distinct docs -> per-doc gap-and-island merge of
  overlapping/adjacent duplicated starts -> maximal duplicated spans.

Any duplicated substring of length >= k tokens contains a duplicated
k-gram at every start position inside it, so the merged islands are
exactly the maximal shared spans (k-gram hash collisions aside). Every
stage is an equi-shuffle on an 8-byte hash or on doc_id — nothing
quadratic, nothing driver-side, and the corpus text itself never shuffles
(only 8-byte gram hashes and integer positions do).

Reference scope: the reference engine (a Kafka->graph ETL, ~1.8k LoC Go)
has no corpus operators; this module is part of the training-data layer
the brief asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# Span gram width in tokens. Lee et al. use 50; the synthetic corpus has
# ~10-100-token documents, so 8 keeps the operator exercised at every SF.
SPAN_K = 8


def _gram_starts(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, g): xxhash64 of the k-token gram starting at pos.

    The token array is materialized first so the per-index lambda does not
    re-split the text per gram (same O(tokens^2) trap minhash avoids).
    ``pos`` is 0-based; hashing the space-joined gram once per start keeps
    the explode output at 12 bytes/gram regardless of token width.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(0), F.size(t) - k)
    gram = lambda i: F.array_join(F.slice(t, i + 1, k), " ")  # noqa: E731
    return toks.where(F.size(t) >= k).select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.struct(i.alias("pos"), F.xxhash64(gram(i)).alias("g")))
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))


def duplicated_gram_hits(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """(doc_id, pos, g, owner): gram starts whose gram appears in >= 2
    distinct documents; owner = lowest doc_id containing the gram.

    Round 12: one window over the gram hash instead of groupBy + join
    back. ``count(DISTINCT doc_id) >= 2`` is exactly ``min(doc_id) !=
    max(doc_id)``, and min/max ARE available as (unordered-frame) window
    functions — so the dup test and the canonical owner both come from a
    SINGLE shuffle on the 8-byte gram hash, and the gram explode+hash
    pass runs once (the old join re-generated the grams subtree as both
    join inputs: two Generates, three Exchanges; this plan has one of
    each).
    """
    grams = _gram_starts(docs, k)
    w = Window.partitionBy("g")
    return (
        grams.withColumn("owner", F.min("doc_id").over(w))
        .withColumn("__mx", F.max("doc_id").over(w))
        .where(F.col("owner") != F.col("__mx"))
        .drop("__mx")
    )


def duplicated_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Maximal cross-document duplicated spans per doc (gap-and-island).

    Output: (doc_id, span_start, span_end, span_len) in 0-based token
    positions, end inclusive. Consecutive duplicated gram starts merge
    into one span: start p and p+1 overlap by k-1 tokens, so the island
    [p_min .. p_max] covers tokens p_min .. p_max+k-1.
    """
    hits = duplicated_gram_hits(docs, k).select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + k).cast("long").alias("span_len"),
        )
        .select("doc_id", "span_start", "span_end", "span_len")
    )


def excise_foreign_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Exact-substring dedup transform: remove every duplicated span from
    every NON-owner doc, keeping the single owner copy corpus-wide.

    A token position is foreign iff it is covered by a duplicated gram
    whose owner is a lower doc_id. Covered positions explode from gram
    starts (p -> p..p+k-1, 4-byte ints), kept tokens rebuild via an
    in-group array_sort — no global sort, one shuffle on doc_id. Docs
    whose text is entirely shared (exact dups) come back as ''.

    Both this and its oracle rebuild text by single-space join, so the
    comparison is exact regardless of original whitespace.
    """
    foreign = duplicated_gram_hits(docs, k).where(F.col("doc_id") > F.col("owner"))
    covered = foreign.select(
        "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tpos")
    ).distinct()
    tokens = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("tpos", "token")
    )
    kept = tokens.join(covered, ["doc_id", "tpos"], "left_anti")
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("tpos", "token"))).alias("ordered"))
        .select(
            "doc_id",
            F.array_join(F.transform("ordered", lambda s: s["token"]), " ").alias("text_clean"),
        )
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


@query(
    "q_dedup_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(t[i+1:i+{SPAN_K}], ' ') AS g
      FROM toks, unnest(range(0, len(t) - {SPAN_K - 1})) AS u(i)
      WHERE len(t) >= {SPAN_K}),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM hits)
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {SPAN_K - 1} AS BIGINT) AS span_end,
           CAST(max(pos) - min(pos) + {SPAN_K} AS BIGINT) AS span_len
    FROM isl GROUP BY doc_id, grp
    """,
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans (>= 8 tokens) across documents.

    Spark groups on xxhash64(gram); the oracle on the gram string itself
    (same answer absent 64-bit collisions, same convention as
    q_dedup_exact). Non-vacuous on the shipped testdata: exact-duplicate
    documents guarantee full-doc shared spans at every SF.
    """
    d = load_table(spark, sf_dir, "documents")
    return duplicated_spans(d, SPAN_K)


@query(
    "q_dedup_span_clean",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(t[i+1:i+{SPAN_K}], ' ') AS g
      FROM toks, unnest(range(0, len(t) - {SPAN_K - 1})) AS u(i)
      WHERE len(t) >= {SPAN_K}),
    dup AS (SELECT g, min(doc_id) AS owner FROM grams
            GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    fr AS (
      SELECT grams.doc_id, grams.pos FROM grams JOIN dup USING (g)
      WHERE grams.doc_id > dup.owner),
    covered AS (
      SELECT DISTINCT doc_id, tpos
      FROM fr, unnest(range(pos, pos + {SPAN_K})) AS c(tpos)),
    tokens AS (
      SELECT doc_id,
             unnest(range(0, len(t))) AS tpos,
             unnest(t) AS token
      FROM toks),
    kept AS (
      SELECT tokens.doc_id, tokens.tpos, tokens.token
      FROM tokens LEFT JOIN covered
        ON tokens.doc_id = covered.doc_id AND tokens.tpos = covered.tpos
      WHERE covered.doc_id IS NULL),
    rebuilt AS (
      SELECT doc_id, string_agg(token, ' ' ORDER BY tpos) AS text_clean
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id, d.lang, d.source,
           COALESCE(r.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
)
def q_dedup_span_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup: every shared >= 8-token passage removed from
    all but its owner (lowest doc_id) document; exact-dup docs become ''.
    """
    d = load_table(spark, sf_dir, "documents")
    return excise_foreign_spans(d, SPAN_K)
