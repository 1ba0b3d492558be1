"""ANN quality checks: the approximate paths must substantially agree with
the brute-force ground truth (they are rows-only in the oracle harness, so
recall against q_sim_topk is their correctness story)."""

from __future__ import annotations

from graph_vulcan_assets_spark.registry import all_queries


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    qs = all_queries()
    exact = {
        (r["qid"], r["nid"]) for r in qs["q_sim_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r["qid"], r["nid"]) for r in qs["q_sim_ivf"](spark, sf_dir).collect()
    }
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    # random 64-dim embeddings are a worst case for IVF; demand meaningful
    # overlap, not perfection
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low"


def test_sessionize_covers_all_events(spark, sf_dir):
    qs = all_queries()
    from graph_vulcan_assets_spark.tables import load_table

    sessions = qs["q_sessionize"](spark, sf_dir)
    total = sessions.groupBy().sum("n_events").collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_ivfpq_recall_vs_exact_l2(spark, sf_dir):
    """IVF-PQ two-stage search: recall@5 against exact integer-L2 top-5.
    Lossier than plain IVF (coarse pruning AND 4-byte codes), so the bar
    is modest — what matters is that the composed pipeline returns real
    neighbors, deterministically."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graph_vulcan_assets_spark.llm.pq import _quantized_vecs
    from graph_vulcan_assets_spark.registry import all_queries

    approx = {
        (r["qid"], r["nid"])
        for r in all_queries()["q_sim_ivfpq"](spark, sf_dir).collect()
    }
    assert approx, "ivfpq returned nothing"

    vecs = _quantized_vecs(spark, sf_dir)
    q = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "pos", F.col("q").alias("qq")
    )
    exact_scored = (
        vecs.join(q, "pos")
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum((F.col("q") - F.col("qq")) * (F.col("q") - F.col("qq"))).alias("l2"))
    )
    w = Window.partitionBy("qid").orderBy("l2", "vec_id")
    exact = {
        (r["qid"], r["vec_id"])
        for r in exact_scored.withColumn("rn", F.row_number().over(w))
        .where("rn <= 5")
        .collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF-PQ recall {recall:.2f} too low"

    # determinism: a second run returns the identical set
    again = {
        (r["qid"], r["nid"])
        for r in all_queries()["q_sim_ivfpq"](spark, sf_dir).collect()
    }
    assert again == approx


def test_mrl_rerank_recall_vs_brute_force(spark, sf_dir):
    """MRL prefix-shortlist + exact re-rank: recall@5 against q_sim_topk.
    Random embeddings are the truncation worst case (no energy
    concentration in the prefix), so the bar is modest; the companion
    q_embed_matryoshka metric is what decides the safe truncation on a
    real corpus."""
    qs = all_queries()
    exact = {
        (r["qid"], r["nid"]) for r in qs["q_sim_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in qs["q_sim_mrl_rerank"](spark, sf_dir).collect()
    }
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"MRL rerank recall {recall:.2f} too low"
    # determinism: a second evaluation returns the identical set
    again = {
        (r["qid"], r["nid"])
        for r in qs["q_sim_mrl_rerank"](spark, sf_dir).collect()
    }
    assert again == approx
