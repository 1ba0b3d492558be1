"""Mergeable HLL sketch rollups (operators/sketches.py).

Rows-only query — these tests carry the correctness burden instead of a
DuckDB oracle: the union-merge identity, an error bound against the exact
distinct, and the incremental-append property that justifies persisting
leaf sketches at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.operators.sketches import (
    LG_K,
    hll_leaf_sketches,
    hll_rollup,
    q_hll_rollup,
)
from graph_vulcan_assets_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))


def test_rollup_estimate_equals_direct_sketch(spark, events):
    """estimate(union(leaf sketches)) == estimate(one sketch over all rows).

    HLL union with equal lgK is register-exact, so the two-phase rollup
    must give bit-identical estimates to the single-pass sketch — this is
    the property that makes stored leaf sketches a safe substitute for
    re-reading the fact table.
    """
    leaves = hll_leaf_sketches(events, ["event_type", "day"], "user_id")
    rolled = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(leaves, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(LG_K))
            ).alias("d")
        )
        .collect()
    }
    assert rolled == direct


def test_estimate_within_5pct_of_exact(spark, sf_dir, events):
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in q_hll_rollup(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert abs(est[k] - v) <= max(1, 0.05 * v), (k, est[k], v)


def test_incremental_append(spark, events):
    """Sketch(old) ∪ sketch(new day) == sketch(all): the incremental-cube
    maintenance path never needs the historical raw rows."""
    cutoff = events.agg(F.max("day")).collect()[0][0]
    old = events.where(F.col("day") < F.lit(cutoff))
    new = events.where(F.col("day") >= F.lit(cutoff))
    assert old.count() > 0 and new.count() > 0
    leaves_old = hll_leaf_sketches(old, ["event_type", "day"], "user_id")
    leaves_new = hll_leaf_sketches(new, ["event_type", "day"], "user_id")
    incremental = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(leaves_old.unionAll(leaves_new), ["event_type"]).collect()
    }
    full = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(
            hll_leaf_sketches(events, ["event_type", "day"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert incremental == full


def test_rollup_runs_registered(spark, sf_dir):
    rows = q_hll_rollup(spark, sf_dir).collect()
    assert len(rows) > 0
    assert [f.name for f in q_hll_rollup(spark, sf_dir).schema.fields] == [
        "event_type",
        "approx_distinct",
        "n_rows",
    ]
