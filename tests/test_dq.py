"""Data-quality expectation checks (operators/dq.py).

Oracle parity runs in tests/test_oracle_parity.py; these pin the report
semantics and that both pass and fail branches occur on the synthetic
data (a report that can only say "passed" proves nothing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.operators.dq import q_dq_checks
from graph_vulcan_assets_spark.tables import load_table


def test_report_shape_and_mixed_outcomes(spark, sf_dir):
    rows = {r["check"]: r for r in q_dq_checks(spark, sf_dir).collect()}
    assert set(rows) == {
        "row_count_min",
        "event_id_unique",
        "user_id_complete",
        "event_type_domain",
        "value_complete",
        "ts_freshness",
    }
    outcomes = {r["passed"] for r in rows.values()}
    assert outcomes == {True, False}  # non-vacuous: both branches occur
    assert not rows["event_type_domain"]["passed"]  # the designed failure


def test_observed_metrics_are_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    rows = {r["check"]: r for r in q_dq_checks(spark, sf_dir).collect()}
    assert rows["row_count_min"]["observed"] == e.count()
    assert (
        rows["event_type_domain"]["observed"]
        == e.where(~F.col("event_type").isin("click", "view", "purchase")).count()
    )
    assert rows["event_id_unique"]["observed"] == e.select("event_id").distinct().count()


def test_single_scan_plan(spark, sf_dir):
    """Adding checks must not add scans: exactly one parquet scan."""
    import re

    from graph_vulcan_assets_spark.plans.lint import plan_text

    # count the numbered detail entries (each physical node appears once
    # in the tree and once in the detail section — match only the latter)
    details = re.findall(
        r"^\(\d+\) Scan parquet", plan_text(q_dq_checks(spark, sf_dir)), re.M
    )
    assert len(details) == 1


def test_psi_flags_injected_drift(spark, sf_dir):
    """PSI must fire on a genuinely shifted distribution and stay quiet on
    an identical one. Built via a synthetic events table: type 'same' has
    the same value multiset in both halves; type 'shifted' moves all
    current-window mass up 8 bins."""
    import datetime

    from graph_vulcan_assets_spark.registry import all_queries

    d = datetime.datetime
    rows = []
    for i in range(400):
        ref_half = i % 2 == 0
        half = d(2024, 1, 5) if ref_half else d(2024, 1, 25)
        base = 15.0 + ((i // 2) % 10)
        rows.append((i, half, 1, "same", base, "{}"))
        rows.append((i + 1000, half, 1, "shifted", base if ref_half else base + 80.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        out = {r.event_type: (r.psi_micros, r.drifted)
               for r in all_queries()["q_drift_psi"](spark, td).collect()}
    assert out["same"][1] is False and out["same"][0] < 50_000
    assert out["shifted"][1] is True and out["shifted"][0] >= 200_000


def test_observed_write_metrics_match_separate_scan(spark, sf_dir, tmp_path):
    from graph_vulcan_assets_spark.operators.dq import observed_write
    from graph_vulcan_assets_spark.tables import load_table

    e = load_table(spark, sf_dir, "events")
    got = observed_write(
        e,
        str(tmp_path / "out"),
        {
            "n_rows": F.count(F.lit(1)),
            "n_users": F.approx_count_distinct(F.col("user_id")),
            "max_value": F.max("value"),
        },
    )
    want = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(F.col("user_id")).alias("n_users"),
        F.max("value").alias("max_value"),
    ).first()
    assert got["n_rows"] == want.n_rows
    assert got["n_users"] == want.n_users
    assert got["max_value"] == want.max_value
    # and the write itself is complete
    assert spark.read.parquet(str(tmp_path / "out")).count() == want.n_rows


def test_psi_sees_negative_value_mass(spark, sf_dir):
    """Round-4 fix: bins were clamped only from above, so negative values
    fell off the 0-9 spine and vanished from counts AND totals — a
    sign-flip upstream was invisible to the drift monitor. With two-sided
    clamping, shifting the current window negative must read as drift."""
    from graph_vulcan_assets_spark.operators.dq import q_drift_psi
    from graph_vulcan_assets_spark.tables import load_table
    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    # sign-flip the current window only (the upstream-bug scenario)
    broken = e.withColumn(
        "value", F.when(F.col("ts") >= cut, -F.col("value")).otherwise(F.col("value"))
    )
    base = {r.event_type: r.psi_micros for r in q_drift_psi(spark, sf_dir).collect()}

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        for t in ("events",):
            broken.write.mode("overwrite").parquet(os.path.join(td, f"{t}.parquet"))
        drifted = {r.event_type: r.drifted for r in q_drift_psi(spark, td).collect()}
    assert any(drifted.values()), (
        "sign-flipped current window not flagged as drift — negative mass "
        "is invisible again"
    )
    assert base, "baseline PSI empty — vacuous"
