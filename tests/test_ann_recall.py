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
