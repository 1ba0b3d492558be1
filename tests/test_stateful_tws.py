"""transformWithStateInPandas sessionizer (Spark-4-native T5 form).

The image ships no google.protobuf, which the transformWithState Python
state server requires — so execution tests skip here (wired-but-
unexecutable, same policy as the Kafka source). What CAN be proven
without protobuf is pinned: the plan compiles to the
TransformWithStateInPySpark operator with event-time semantics, the
processor closure cloudpickles by value, and the emitted schema matches
the v1 sessionizer's (so the shared oracle stays valid).
"""

from __future__ import annotations

import pytest

from graph_vulcan_assets_spark.streaming import stateful, stateful_tws


def _stream_events(spark, sf_dir, tmp_path):
    from graph_vulcan_assets_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(events.schema).parquet(src)


def test_tws_plan_compiles_with_event_time(spark, sf_dir, tmp_path):
    stream = _stream_events(spark, sf_dir, tmp_path)
    df = stateful_tws.sessionize_tws(stream)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "TransformWithState" in plan
    assert "EventTime" in plan
    assert "EventTimeWatermark" in plan


def test_tws_schema_matches_v1_sessionizer(spark, sf_dir, tmp_path):
    """Both sessionizers must emit the identical schema — they share one
    oracle, and a deployment can swap v1 for the Spark-4 form in place."""
    stream = _stream_events(spark, sf_dir, tmp_path)
    assert (
        stateful_tws.sessionize_tws(stream).schema
        == stateful.sessionize_stateful(stream).schema
    )


def test_tws_processor_cloudpickles_by_value(tmp_path):
    """The driver contract imports __spark_entry__.py by file path, so
    executors can't import this package — the processor must unpickle in
    a Python process where graph_vulcan_assets_spark is NOT importable
    (by-value serialization, no module references)."""
    import subprocess
    import sys

    from pyspark import cloudpickle

    proc = stateful_tws._make_session_processor(stateful.GAP_SECONDS)
    blob_path = tmp_path / "proc.pkl"
    blob_path.write_bytes(cloudpickle.dumps(proc))
    check = (
        "import sys; sys.path = [p for p in sys.path if 'repo' not in p]; "
        "from pyspark import cloudpickle; "
        f"clone = cloudpickle.loads(open({str(blob_path)!r}, 'rb').read()); "
        "assert 'graph_vulcan_assets_spark' not in sys.modules; "
        "assert hasattr(clone, 'handleInputRows') and hasattr(clone, 'handleExpiredTimer')"
    )
    res = subprocess.run(
        [sys.executable, "-c", check], cwd=str(tmp_path), capture_output=True, text=True
    )
    assert res.returncode == 0, res.stderr


@pytest.mark.skipif(
    not stateful_tws.tws_available(),
    reason="google.protobuf not in image — transformWithState state server cannot start",
)
def test_tws_matches_v1_sessionizer_end_to_end(spark, sf_dir, tmp_path):
    """On an image with protobuf: the Spark-4 sessionizer's emitted
    closed sessions equal the applyInPandasWithState sessionizer's."""
    got = stateful_tws.replay_sessionize_tws(
        spark, sf_dir, str(tmp_path / "ck1"), str(tmp_path / "s1")
    )
    want = stateful.replay_sessionize(
        spark, sf_dir, str(tmp_path / "ck2"), str(tmp_path / "s2")
    )
    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["session_value"],
    )
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
