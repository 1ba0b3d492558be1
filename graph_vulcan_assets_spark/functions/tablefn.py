"""Python UDTF (user-defined table function) — the last quadrant of the
§2.10 function surface (scalar pandas_udf / grouped-map applyInPandas /
iterator mapInPandas / stateful applyInPandasWithState cover the rest).

Policy reminder (SURVEY §2.10): built-in expressions first — a UDTF is
row-at-a-time Python and belongs only where the row→rows expansion logic
genuinely needs imperative code (stateful parsers, decoders with
carry-over). This one exists to prove the surface end-to-end: lateral
correlation against a real table, Arrow-batched transfer, and a DuckDB
oracle over the same split semantics.

The reference has no user-extensible function surface at all
(stream/stream.go:21-26 MsgHandler is the closest); this is engine-side
extension API, exercised the way a user would extend it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table


@query(
    "q_udtf_sentences",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             unnest(string_split(text, '. ')) AS sentence
      FROM documents),
    k AS (
      SELECT doc_id, sentence FROM s WHERE len(sentence) > 0)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(max(len(sentence)) AS BIGINT) AS max_sent_chars,
           min(sentence) AS first_alpha_sentence
    FROM k GROUP BY doc_id
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation via a Python UDTF + lateral join, rolled up
    per document.

    The UDTF is defined as a nested class so cloudpickle serializes it by
    value (the driver imports __spark_entry__.py by file path — executors
    cannot import this package by name). ``useArrow=True`` batches rows
    over Arrow instead of pickling one at a time.

    The oracle reproduces the exact same segmentation ('. ' literal split,
    empty segments dropped) with DuckDB's string_split, so the rollup
    hash-matches; the segmentation itself is trivially expressible with
    built-ins — the point here is proving the UDTF surface (lateral
    correlation, multi-row emit) against a real table, not the splitter.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: long, sentence: string, n_chars: long", useArrow=True)
    class Sentences:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for seg in text.split(". "):
                if seg:
                    yield idx, seg, len(seg)
                    idx += 1

    spark.udtf.register("gvas_sentences", Sentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    exploded = spark.sql(
        """
        SELECT d.doc_id, t.sent_idx, t.sentence, t.n_chars
        FROM _udtf_docs d, LATERAL gvas_sentences(d.text) t
        """
    )
    return exploded.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_sentences"),
        F.max("n_chars").cast("long").alias("max_sent_chars"),
        F.min("sentence").alias("first_alpha_sentence"),
    )
