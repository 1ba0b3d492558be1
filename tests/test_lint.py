"""Plan-lint utility: each anti-pattern detector must fire on a minimal
offending plan and stay silent on the clean equivalent."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.plans.lint import assert_scales, lint
from graph_vulcan_assets_spark.tables import load_table


def codes(df):
    return {f.code for f in lint(df)}


def test_cartesian_detected(spark):
    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "id2")
    assert "cartesian" in codes(a.crossJoin(b))


def test_equi_join_clean(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    assert "cartesian" not in codes(o.join(c, o.o_custkey == c.c_custkey))


def test_global_window_detected(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts")  # no partitionBy → SinglePartition
    assert "global-window" in codes(e.withColumn("rn", F.row_number().over(w)))


def test_partitioned_window_clean(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    assert "global-window" not in codes(e.withColumn("rn", F.row_number().over(w)))


def test_topk_sort_clean(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert "global-sort-no-limit" not in codes(e.orderBy("ts").limit(10))


def test_pushdown_clean(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert "no-pushdown" not in codes(e.where(F.col("user_id") == 7))


def test_assert_scales_raises_and_allows(spark):
    a = spark.range(50)
    b = spark.range(50).withColumnRenamed("id", "id2")
    bad = a.crossJoin(b)
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scales(bad)
    assert_scales(bad, allow={"cartesian"})  # reviewed & accepted


@pytest.mark.parametrize(
    "name", ["q_agg_groupby", "q_join_range", "q_dedup_near", "q_corpus_shuffle"]
)
def test_registered_queries_pass_lint(spark, sf_dir, name):
    """Spot-check: core registered queries carry no unreviewed findings."""
    from graph_vulcan_assets_spark.registry import all_queries

    assert_scales(all_queries()[name](spark, sf_dir))


# Reviewed scale-lint exemptions for the FULL registry sweep below. Every
# entry is a deliberate, bounded use of the flagged pattern — a new
# finding on any other query (or a new code on these) fails the sweep.
ALLOW = {
    # final ordered output of an aggregated handful of rows (TPC-H report
    # shape): the sort runs over 5-25 rows
    "q_shape_q5": {"global-sort-no-limit"},
    "q_shape_q7": {"global-sort-no-limit"},
    "q_shape_q8": {"global-sort-no-limit"},
    # P-row per-range prefix attach; its own plan test pins
    # rangepartitioning + <=2 SinglePartition (the 1-row grand-total is a
    # scalar subquery since round 12 — no cartesian)
    "q_hist_equidepth": {"global-sort-no-limit", "global-window"},
    # broadcast-bounded pair generation: <=200-doc exact-oracle pairsets
    # (ngram/embed ground truths), 10-query-vector probe side (sim),
    # deliberate tiny cross join op. (Round 12 removed the whole 1-row
    # scalar-attach class — tfidf/bm25/mix/spine-bounds/BPE-argmax now
    # attach via tables.attach_scalar, a scalar subquery with no join
    # node, so those queries carry no exemption at all.)
    "q_dedup_ngram": {"cartesian"},
    "q_dedup_embed": {"cartesian"},
    "q_sim_topk": {"cartesian"},
    "q_sim_mrl_rerank": {"cartesian"},
    "q_join_cross": {"cartesian"},
    "q_sim_ivf": {"cartesian"},
    # BPE training keeps the broadcast-crossJoin argmax attach: round 12
    # measured the scalar-subquery alternative and rejected it — between
    # checkpoints the iterations nest, and nested subqueries re-evaluate
    # per nesting level while identical broadcast subtrees are deduped by
    # exchange reuse within the one plan
    "q_bpe_merges": {"cartesian"},
    "q_bpe_encode": {"cartesian"},
    # the counting-rank's serial window runs over the LENGTH HISTOGRAM
    # (thousands of rows at any corpus size), not the corpus
    "q_length_buckets": {"global-window"},
    "q_quantile_filter": {"global-window"},
}


def test_full_registry_passes_scale_lint(spark, sf_dir):
    """Every registered query's physical plan is free of scale
    anti-patterns, or its finding is a reviewed exemption above."""
    from graph_vulcan_assets_spark.plans.lint import lint as _lint
    from graph_vulcan_assets_spark.registry import all_queries

    unexpected = {}
    for name, fn in all_queries().items():
        found = {f.code for f in _lint(fn(spark, sf_dir))}
        extra = found - ALLOW.get(name, set())
        if extra:
            unexpected[name] = sorted(extra)
    assert not unexpected, f"unreviewed scale anti-patterns: {unexpected}"
