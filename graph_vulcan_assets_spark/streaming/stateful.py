"""Custom stateful streaming operator (SURVEY §2.9 T5 extension):
gap-based sessionization via ``applyInPandasWithState``.

The reference's stateful processing is table-upsert state keyed by asset
(``inventory/inventory.go``); the engine reproduces that with the replay
pipeline (plans/temporal.py). This module adds the *custom* stateful-operator
shape Spark offers beyond SQL: per-key mutable state with event-time
timeouts, held in the state store across micro-batches.

Semantics match the batch sessionizer (operators/windows.py q_sessionize):
a session closes after 30 minutes of per-user silence. In streaming form a
session is EMITTED when

- a later event for the same user arrives past the gap (closed by data), or
- the event-time watermark passes session_end + gap (closed by timeout) —
  so quiet users flush without waiting for their next event.

Scale shape: state is one fixed-width tuple per active user (3 longs + a
128-bit decimal), the stream shuffles once on user_id, and each micro-batch
moves only that batch's keys through Python via Arrow. Values are
pre-quantized to integer micros JVM-side so the Python stage does integer
sums only — no float summation-order drift between engines. The session
total is held as DECIMAL(38,0) (tables.micros128 convention, round 11): a
long state field would overflow — and ANSI-kill the stream permanently on
every checkpoint replay — at two near-VALUE_BOUND readings in one session,
while the batch twin's 128-bit accumulator sails on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from graph_vulcan_assets_spark.tables import (
    VALUE_BOUND,
    bounded_times,
    epoch_sec_sql,
    bounded_ts,
    bounded_ts_sql,
    micros128,
    quantizable,
)

GAP_SECONDS = 1800

# state: one fixed-width row per open session; value_micros is the 128-bit
# session total (tables.micros128 convention — see module docstring).
# STATE-FORMAT COMPATIBILITY (ADVICE r11): the round-11 long→decimal(38,0)
# widening breaks checkpoint compatibility — Spark's state-schema check
# rejects a pre-change checkpoint on restart. Upgrading across round 11
# requires a fresh checkpoint directory (the sessionizer's state is
# re-derivable from the replayed source); see streaming/incremental.py
# for the equivalent batch-state migration note.
_STATE_SCHEMA = (
    "session_start_us long, last_ts_us long, n_events long, "
    "value_micros decimal(38,0)"
)
# raw emitted rows (timestamps re-hydrated JVM-side by sessionize_stateful)
_RAW_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, value_micros decimal(38,0)"
)


def _make_sessionize_group(gap_seconds: int):
    """Build the per-group state function as a self-contained CLOSURE.

    cloudpickle serializes a closure by value, a module-level function by
    module reference — and the executors' Python workers can't import this
    package when the driver process runs from an arbitrary cwd (the driver
    contract imports __spark_entry__.py by file path). Nothing in the
    returned function may reference this module's globals.
    """
    cols = ["user_id", "session_start_us", "session_end_us", "n_events", "value_micros"]

    def sessionize_group(key, pdfs, state):
        import decimal

        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, micros = state.get
            state.remove()
            yield pd.DataFrame([[user_id, start, last, n, micros]], columns=cols)
            return

        pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        if state.exists:
            start, last, n, micros = state.get
            # the 128-bit state field arrives as decimal.Decimal; Python
            # ints are unbounded, so the in-loop accumulator stays int
            micros = int(micros)
        else:
            start = last = None
            n = micros = 0

        closed = []
        for t, v in zip(pdf["ts_us"].to_numpy(), pdf["value_micros"].to_numpy()):
            t, v = int(t), int(v)
            # gap on floor-seconds: identical to the batch/oracle formula
            # epoch(ts2) - epoch(ts1) > gap (each timestamp truncated)
            if last is not None and t // 1_000_000 - last // 1_000_000 > gap_seconds:
                closed.append([user_id, start, last, n, decimal.Decimal(micros)])
                start, n, micros = None, 0, 0
            if start is None:
                start = t
            last = t
            n += 1
            micros += v

        state.update((start, last, n, decimal.Decimal(micros)))
        # event-time timeout: flush when the watermark passes last_ts + gap
        state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(closed, columns=cols)

    return sessionize_group


def sessionize_stateful(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """30-minute-gap sessionization as a custom stateful streaming operator.

    ``events`` must be a streaming DataFrame with columns
    (event_id, ts, user_id, value). Returns the closed-session stream:
    (user_id, session_start, session_end, n_events, session_value).
    """
    # Dirty-event guards (round-5 hostile sweep) — in a STREAMING sink a
    # poison row is fatal in a way batch never is: the checkpoint replays
    # the same micro-batch on every restart, so one NaN value or NULL
    # event-time crashes the pipeline permanently. NULL event-times are
    # dropped (no position on the event-time axis → no session membership);
    # non-finite values contribute 0 to session_value but still count as
    # events (the COUNT-AS-ZERO contract — distinct from the windowed
    # aggregates' DROP-ROW contract; see streaming/windows.tumbling_counts
    # for the two-contract note). Both rules are mirrored in the oracle SQL.
    # tables.quantizable is the single shared predicate (a finite 1e308
    # overflows value*1e6 to Inf before the BIGINT cast, exactly like NaN)
    finite_val = F.col("value").isNotNull() & quantizable("value")
    prepared = (
        events.where(F.col("ts").isNotNull() & bounded_ts("ts"))
        .withWatermark("ts", watermark)
        .select(
            "ts",  # carries the watermark; unused by the pandas stage
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            # quantize JVM-side: identical HALF_UP rounding to the batch/oracle
            F.when(finite_val, F.round(F.col("value") * 1_000_000, 0).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("value_micros"),
        )
    )
    raw = prepared.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_group(GAP_SECONDS),
        outputStructType=_RAW_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return raw.select(
        "user_id",
        F.timestamp_micros("session_start_us").alias("session_start"),
        F.timestamp_micros("session_end_us").alias("session_end"),
        "n_events",
        F.round(F.col("value_micros") / 1_000_000.0, 2).alias("session_value"),
    )


def batch_sessions(events: DataFrame) -> DataFrame:
    """Batch ground truth: per-session summary with the same gap/quantization.

    Same lag + cumulative-marker plan as q_sessionize
    (operators/windows.py), aggregated to one row per session.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > GAP_SECONDS), 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = events.withColumn("new_session", new_session).withColumn(
        "session_no", F.sum("new_session").over(cum)
    )
    micros = micros128("value")
    return sessioned.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(micros) / 1_000_000.0, 2).alias("session_value"),
    )


def replay_sessionize(spark, sf_dir: str, checkpoint_dir: str, source_dir: str) -> DataFrame:
    """File-replay harness: stream the events table through the stateful
    sessionizer into a memory sink; returns the emitted closed sessions.

    The source is written as ONE file so the replay is a single ordered
    micro-batch — the deterministic configuration the oracle mirrors (a
    multi-file replay exercises cross-batch state; tests cover that path
    with controlled file ordering).
    """
    from graph_vulcan_assets_spark.tables import load_table

    # BOUNDED ts domain at the stream source (mirrored in the oracle's
    # every events reference, including the watermark subquery): an
    # out-of-domain event time breaks the state store's watermark/timeout
    # arithmetic (STREAM_FAILED on the extreme-ts probe), and a year-9999
    # row would drag the end-of-stream watermark past every real session
    # — the streaming-stateful contract from tables.py's domain note
    events = bounded_times(load_table(spark, sf_dir, "events")).select(
        "event_id", "ts", "user_id", "value"
    )
    events.coalesce(1).write.mode("overwrite").parquet(source_dir)
    stream = spark.readStream.schema(events.schema).parquet(source_dir)
    name = "stream_sessions_" + abs(hash((sf_dir, source_dir))).__str__()
    # scope the state-store partition count to the replay: a vanilla session
    # defaults to 200 shuffle partitions, 6x more tasks than useful for a
    # test-SF micro-batch (the checkpoint pins the count, so it must be set
    # before the first trigger)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(min(int(prev_shuffle), 32)))
    try:
        q = (
            sessionize_stateful(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(300)
        q.stop()
        if not finished:
            # stopping an unfinished availableNow run leaves a PARTIAL
            # memory sink — returning it would surface as a wrong-answer
            # mismatch (or a vacuous pass) instead of the timeout it is
            raise TimeoutError(
                "stream sessionize did not finish within 300s — partial "
                "results discarded"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    return spark.table(name)


from graph_vulcan_assets_spark.registry import query  # noqa: E402


@query(
    "q_stream_sessionize",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       -- floor-SECOND gap (round-11 time-edge probe —
                       -- same class as q_sessionize; the Python path's
                       -- t // 1_000_000 is floor division, so all
                       -- three forms agree exactly)
                       OR {epoch_sec_sql('ts')}
                          - {epoch_sec_sql('lag(ts) OVER w')} > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL AND {bounded_ts_sql()}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked),
    sess AS (
      SELECT user_id, session_no,
             min(ts) AS session_start, max(ts) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events,
             round(sum(CASE WHEN value IS NOT NULL AND isfinite(value)
                                 AND abs(value) < {VALUE_BOUND}
                            THEN CAST(round(value * 1000000, 0) AS BIGINT)
                            ELSE 0 END) / 1000000.0, 2)
               AS session_value
      FROM sessioned GROUP BY user_id, session_no)
    SELECT user_id, session_start, session_end, n_events, session_value
    FROM sess
    WHERE session_no < (SELECT max(session_no) FROM sess s2
                        WHERE s2.user_id = sess.user_id)
       OR epoch_us(session_end) // 1000 + 1800000
          < (SELECT max(epoch_us(ts)) // 1000 FROM events
             WHERE {bounded_ts_sql()}) - 7200000
    """,
)
def q_stream_sessionize(spark, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization (T5 extension), oracle-checked.

    Replays the events table through ``applyInPandasWithState`` as a real
    Structured Streaming query (file source → state store → memory sink)
    and returns the emitted CLOSED sessions. The oracle is deterministic:
    every non-final session (closed by a later event), PLUS each user's
    final session iff it TIMED OUT by end of stream — availableNow runs a
    final no-data batch whose watermark is max(ts) − 2 h (in ms), and the
    state store fires timeouts strictly below it (timeout timestamp =
    session_end_ms + gap_ms). Final sessions younger than that stay open
    and are correctly NOT emitted in append mode.
    """
    import tempfile

    base = tempfile.mkdtemp(prefix="gvas_stream_sess_")
    return replay_sessionize(spark, sf_dir, base + "/ckpt", base + "/src")
