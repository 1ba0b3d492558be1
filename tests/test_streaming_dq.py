"""Streaming DQ admission control (streaming/incremental.py::gate_with_dq).

Three micro-batches (maxFilesPerTrigger=1 maps file → batch): two hold
only in-domain event types and must land in the main sink; one carries
the full event-type mix, fails the domain check, and must be quarantined
whole. The report table records every batch either way.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.streaming.incremental import gate_with_dq
from graph_vulcan_assets_spark.tables import load_table


@pytest.fixture()
def dirs(tmp_path):
    return {
        name: str(tmp_path / name)
        for name in ("src", "out", "quarantine", "report", "ckpt")
    }


def _batch_dirs(path):
    return sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(path, "batch=*"))
    )


def test_failing_batch_is_quarantined_whole(spark, sf_dir, dirs):
    e = load_table(spark, sf_dir, "events")
    clean = e.where(F.col("event_type").isin("click", "view", "purchase"))
    dirty = e  # carries 'signup'/'error' → fails event_type_domain

    clean.limit(150).coalesce(1).write.parquet(os.path.join(dirs["src"], "f0"))
    clean.limit(300).coalesce(1).write.parquet(os.path.join(dirs["src"], "f1"))
    dirty.limit(200).coalesce(1).write.parquet(os.path.join(dirs["src"], "f2"))

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(dirs["src"], "*"))
    )
    q = gate_with_dq(
        stream,
        dirs["out"],
        dirs["quarantine"],
        dirs["report"],
        dirs["ckpt"],
        min_rows=50,
    ).start()
    q.awaitTermination(120)

    assert len(_batch_dirs(dirs["out"])) == 2
    assert len(_batch_dirs(dirs["quarantine"])) == 1
    assert len(_batch_dirs(dirs["report"])) == 3

    report = spark.read.parquet(dirs["report"])
    by_batch = {
        r["batch_id"]: r["passed"]
        for r in report.where(F.col("check") == "event_type_domain").collect()
    }
    assert sorted(by_batch.values()).count(False) == 1

    # nothing lost, nothing duplicated: out ∪ quarantine == input rows
    total_in = 150 + 300 + 200
    total_out = spark.read.parquet(dirs["out"]).count()
    total_q = spark.read.parquet(dirs["quarantine"]).count()
    assert total_out + total_q == total_in
    # the quarantined batch is the dirty one, intact
    assert total_q == 200
