"""Custom stateful operator (applyInPandasWithState): streaming sessionize.

Two proofs:
- single-batch replay of the events table emits exactly the batch
  sessionization minus each user's final (still-open) session;
- a multi-batch replay with an advancing watermark flushes idle users'
  sessions through the event-time TIMEOUT path, across micro-batches.
(The DuckDB oracle for q_stream_sessionize is exercised separately by
tests/test_oracle_parity.py.)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.streaming import stateful


def test_stream_matches_batch_minus_open_tail(spark, sf_dir, tmp_path):
    """Emitted = every data-closed session + final sessions that timed out
    under the end-of-stream watermark (max ts − 2 h); final sessions still
    inside the watermark stay open and must NOT be emitted."""
    emitted = stateful.replay_sessionize(
        spark, sf_dir, str(tmp_path / "ckpt"), str(tmp_path / "src")
    )
    from graph_vulcan_assets_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    sess = stateful.batch_sessions(events)
    wm_ms = (
        events.agg((F.floor(F.unix_micros(F.max("ts")) / 1000) - 7_200_000).alias("wm"))
        .collect()[0]["wm"]
    )
    last = Window.partitionBy("user_id")
    end_ms = F.floor(F.unix_micros(F.col("session_end")) / 1000)
    expected = (
        sess.withColumn("max_no", F.max("session_no").over(last))
        .where(
            (F.col("session_no") < F.col("max_no"))
            | (end_ms + stateful.GAP_SECONDS * 1000 < F.lit(wm_ms))
        )
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
    )
    got = {tuple(r) for r in emitted.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want
    assert len(got) > 0


def _write_events_file(path: str, rows: list[tuple[int, int, int, float]], mtime: int) -> None:
    """rows: (event_id, ts_us_epoch, user_id, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_timeout_flushes_idle_user_across_batches(spark, tmp_path):
    """File 1: user 1's two events. Files 2/3 advance the watermark by days.
    Processing file 3, the watermark (past file 2's event − 2 h) exceeds
    user 1's last_ts + gap, so the state store times user 1 out and emits
    the session — without user 1 ever sending another event."""
    src = tmp_path / "src"
    src.mkdir()
    t0 = 1_700_000_000_000_000  # any epoch, microseconds
    day = 86_400 * 1_000_000
    _write_events_file(str(src / "f1.parquet"), [(1, t0, 1, 1.5), (2, t0 + 60_000_000, 1, 2.25)], 1_700_000_000)
    _write_events_file(str(src / "f2.parquet"), [(3, t0 + 10 * day, 2, 0.5)], 1_700_000_010)
    _write_events_file(str(src / "f3.parquet"), [(4, t0 + 20 * day, 3, 0.5)], 1_700_000_020)

    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful.sessionize_stateful(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("timeout_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {tuple(r) for r in spark.sql(
        "SELECT user_id, n_events, session_value FROM timeout_sessions"
    ).collect()}
    # user 1's session closed via timeout (2 events, 1.5 + 2.25); user 2 may
    # also time out when file 3's watermark passes it; user 3 stays open
    assert (1, 2, 3.75) in rows
    assert not any(u == 3 for (u, _, _) in rows)


def test_checkpoint_recovery_resumes_state(spark, tmp_path):
    """Stop the stream after the first file, then restart from the SAME
    checkpoint with more files present: per-user session state must
    survive the restart (user 1's two straddling events form ONE session,
    not two), and the final output must equal an uninterrupted run."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    t0 = 1_700_000_000_000_000
    day = 86_400 * 1_000_000
    # user 1's session straddles the two files (gap 60 s < 30 min)
    _write_events_file(str(src / "f1.parquet"), [(1, t0, 1, 1.0)], 1_700_000_000)

    schema = "event_id long, ts timestamp, user_id long, value double"
    out = str(tmp_path / "out")  # file sink: the recoverable sink kind

    def run_available():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stateful.sessionize_stateful(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_available()  # processes f1, checkpoints, stops

    _write_events_file(str(src / "f2.parquet"), [(2, t0 + 60_000_000, 1, 2.0)], 1_700_000_010)
    _write_events_file(str(src / "f3.parquet"), [(3, t0 + 10 * day, 2, 0.5)], 1_700_000_020)
    _write_events_file(str(src / "f4.parquet"), [(4, t0 + 20 * day, 3, 0.5)], 1_700_000_030)

    run_available()  # resumes from the checkpoint, f2..f4

    rows = {
        (r["user_id"], r["n_events"], r["session_value"])
        for r in spark.read.parquet(out).collect()
    }
    # one MERGED session for user 1 (state survived the restart), closed by
    # timeout once the watermark passed; two separate sessions would be
    # (1,1,1.0)+(1,1,2.0)
    assert (1, 2, 3.0) in rows
    assert (1, 1, 1.0) not in rows
