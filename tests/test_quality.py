"""Hashed linear quality classifier (llm/quality.py).

Oracle parity runs in tests/test_oracle_parity.py; these tests pin the
semantic properties the hash-compare alone wouldn't localize.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.quality import (
    _SHIFT,
    _token_weight,
    classifier_scores,
    q_classifier_route,
    q_quality_classifier,
)
from graph_vulcan_assets_spark.tables import load_table


def test_weight_range_and_determinism(spark):
    """Weights live in [-999, 999] and are a pure function of the token."""
    toks = spark.createDataFrame(
        [("the",), ("quick",), ("fox",), ("the",), ("",)], ["term"]
    )
    rows = toks.select("term", _token_weight(F.col("term")).alias("w")).collect()
    by_term = {}
    for r in rows:
        assert -_SHIFT <= r["w"] <= _SHIFT
        assert by_term.setdefault(r["term"], r["w"]) == r["w"]


def test_keep_is_threshold_on_logit(spark, sf_dir):
    scores = q_quality_classifier(spark, sf_dir)
    bad = scores.where(
        (F.col("keep") & (F.col("logit") < 0))
        | (~F.col("keep") & (F.col("logit") >= 0))
    )
    assert bad.count() == 0
    # both branches of the gate are exercised by the corpus
    kept = scores.where("keep").count()
    dropped = scores.where("NOT keep").count()
    assert kept > 0 and dropped > 0


def test_logit_is_sum_of_token_weights(spark, sf_dir):
    """Spot-check one document end-to-end against a per-token recompute."""
    d = load_table(spark, sf_dir, "documents")
    doc = d.orderBy("doc_id").limit(1)
    logit = classifier_scores(doc).collect()[0]["logit"]
    manual = (
        doc.select(F.explode(F.split("text", " ")).alias("term"))
        .select(_token_weight(F.col("term")).alias("w"))
        .agg(F.sum("w"))
        .collect()[0][0]
    )
    assert logit == manual


def test_route_bands_partition_the_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    routed = q_classifier_route(spark, sf_dir)
    assert routed.agg(F.sum("n_docs")).collect()[0][0] == d.count()
    bands = {r["band"] for r in routed.select("band").distinct().collect()}
    assert bands <= {0, 1, 2, 3}
    assert len(bands) >= 2  # non-vacuous banding on the test corpus


def test_model_table_path_matches_inline_derivation(spark, sf_dir):
    """Broadcast weight-table lookup ≡ inline hash derivation when the
    table covers the vocabulary — the proof that swapping in a real
    exported model is only a data change."""
    from graph_vulcan_assets_spark.llm.quality import (
        classifier_scores_with_model,
        vocab_weights,
    )

    d = load_table(spark, sf_dir, "documents")
    inline = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["keep"])
        for r in classifier_scores(d).collect()
    }
    via_model = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["keep"])
        for r in classifier_scores_with_model(d, vocab_weights(d)).collect()
    }
    assert via_model == inline


def test_model_table_oov_scores_zero(spark):
    from graph_vulcan_assets_spark.llm.quality import classifier_scores_with_model

    docs = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
    weights = spark.createDataFrame([("alpha", 7), ("beta", -3)], ["term", "wt"])
    row = classifier_scores_with_model(docs, weights).collect()[0]
    assert (row["n_tokens"], row["logit"], row["keep"]) == (3, 4, True)
