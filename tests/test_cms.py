"""Count-min sketch properties (operators/sketches.py CMS section)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from graph_vulcan_assets_spark.tables import load_table


def test_estimate_never_underestimates(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id")
    truth = e.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    est = cms_estimate(sketch, e.select("user_id").distinct(), "user_id")
    joined = est.join(truth, "user_id")
    assert joined.where(F.col("est") < F.col("true_cnt")).count() == 0
    # and the total mass is conserved in every hash row
    per_row = sketch.groupBy("j").agg(F.sum("cnt").alias("mass")).collect()
    n = e.count()
    assert all(r.mass == n for r in per_row)


def test_merge_equals_rebuild(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("event_id") % 2 == 0)
    b = e.where(F.col("event_id") % 2 == 1)
    merged = {(r.j, r.c): r.cnt for r in cms_merge(cms_build(a, "user_id"), cms_build(b, "user_id")).collect()}
    full = {(r.j, r.c): r.cnt for r in cms_build(e, "user_id").collect()}
    assert merged == full


def test_heavy_hitters_nonvacuous(spark, sf_dir):
    from graph_vulcan_assets_spark.registry import all_queries

    rows = all_queries()["q_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.est >= 12 for r in rows)


def test_null_keys_excluded_from_build_and_probe(spark):
    """Round-4 fix: a NULL key hashed to NULL cells no probe could join
    back, returning est=0 for a positive true count — an underestimate
    from a structure guaranteed never to underestimate. NULLs are now
    excluded symmetrically on build and probe."""
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 7 + [("b",)] * 2, "k string"
    )
    sk = cms_build(df, "k")
    probes = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    got = {r.k: r.est for r in cms_estimate(sk, probes, "k").collect()}
    # NULL probe rows are dropped, keyed estimates hold the invariant
    assert None not in got
    assert got["a"] >= 5 and got["b"] >= 2
