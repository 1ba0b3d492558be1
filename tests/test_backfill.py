"""Partition backfill (plans/backfill.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.plans.backfill import PartitionBackfill
from graph_vulcan_assets_spark.tables import load_table


def _transform(df):
    return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def _land(spark, sf_dir, src, days):
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    for d in days:
        e.where(F.col("day") == d).drop("day").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"day={d}"))
    return e


def test_catchup_processes_only_new_partitions(spark, sf_dir, tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    _land(spark, sf_dir, src, ["2024-01-02", "2024-01-03"])
    bf = PartitionBackfill(spark, src, out, _transform)
    assert bf.run() == ["2024-01-02", "2024-01-03"]
    assert bf.run() == []  # nothing new: nothing reprocessed

    _land(spark, sf_dir, src, ["2024-01-04"])
    assert bf.run() == ["2024-01-04"]

    # output equals the direct recompute over the same three days
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    want = sorted(
        tuple(r)
        for r in e.where(
            F.col("day").isin("2024-01-02", "2024-01-03", "2024-01-04")
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = sorted(
        (r.day, r.event_type, r.n)
        for r in bf.read_output()
        .select(F.col("day").cast("string").alias("day"), "event_type", "n")
        .collect()  # discovery infers day as DATE; normalize for compare
    )
    assert got == want


def test_crash_rerun_idempotent_and_restatement(spark, sf_dir, tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    _land(spark, sf_dir, src, ["2024-01-05"])
    bf = PartitionBackfill(spark, src, out, _transform)
    bf.run()
    before = sorted(tuple(r) for r in bf.read_output().collect())

    # crash-before-marker: the marker is gone, output may be half-written;
    # the re-run overwrites and re-marks, converging to the same result
    os.remove(os.path.join(out, "_done", "2024-01-05"))
    assert bf.run() == ["2024-01-05"]
    assert sorted(tuple(r) for r in bf.read_output().collect()) == before

    # upstream restatement: explicit invalidate → reprocess picks up the
    # restated data
    e = load_table(spark, sf_dir, "events")
    e.limit(10).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "day=2024-01-05")
    )
    bf.invalidate("2024-01-05")
    assert bf.run() == ["2024-01-05"]
    n_after = bf.read_output().agg(F.sum("n")).first()[0]
    assert n_after == 10


def test_partition_admitted_only_after_landing_complete(spark, tmp_path):
    """Round-4 fix: a scheduled run firing while upstream is still landing
    a partition must NOT process the half-written directory (it would be
    permanently marked done with files missing). _SUCCESS admits
    immediately; otherwise the newest-file quiet period gates."""
    import os
    import time

    from graph_vulcan_assets_spark.plans.backfill import PartitionBackfill

    src = str(tmp_path / "src")
    part = os.path.join(src, "day=2024-06-01")
    spark.range(10).write.parquet(part)  # Spark write → has _SUCCESS
    os.remove(os.path.join(part, "_SUCCESS"))  # simulate non-Spark lander

    bf = PartitionBackfill(
        spark, src, str(tmp_path / "out"), lambda df: df, settle_seconds=3600
    )
    # freshly-written files: inside the settle window → held back
    assert bf.pending() == []
    # quiet long enough → admitted
    old = time.time() - 7200
    for f in os.listdir(part):
        os.utime(os.path.join(part, f), (old, old))
    assert bf.pending() == ["2024-06-01"]
    # _SUCCESS short-circuits the quiet period for fresh landings
    part2 = os.path.join(src, "day=2024-06-02")
    spark.range(5).write.parquet(part2)  # keeps its _SUCCESS
    assert bf.pending() == ["2024-06-01", "2024-06-02"]
    assert sorted(bf.run()) == ["2024-06-01", "2024-06-02"]
    assert bf.read_output().count() == 15
