"""Spark-4-native stateful streaming (SURVEY §2.9 T5, second form):
gap-based sessionization via ``transformWithStateInPandas``.

Same semantics and same DuckDB oracle as the ``applyInPandasWithState``
sessionizer (streaming/stateful.py) — a session closes after 30 minutes
of per-user silence, emitted when a later event closes it or the
event-time watermark passes session_end + gap. The difference is the
operator API: ``StatefulProcessor`` with named ``ValueState`` and
explicit event-time TIMERS is Spark 4's replacement for the
flatMapGroupsWithState-era API — state is schema'd and inspectable
(state data source), timers are first-class instead of a single
per-key timeout, and the state store is RocksDB (required by
transformWithState; incremental checkpointing, no JVM-heap state).

Scale shape: identical to the v1 sessionizer — one shuffle on user_id,
fixed-width per-user state, Arrow-batched Python only for that batch's
keys. Reference has no analogue (its state lives in the external graph
store); this is engine extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.streaming.stateful import (
    _RAW_OUT_SCHEMA,
    _STATE_SCHEMA,
    GAP_SECONDS,
)
from graph_vulcan_assets_spark.tables import bounded_ts, quantizable

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _make_session_processor(gap_seconds: int):
    """Build the StatefulProcessor as a self-contained closure-held class:
    cloudpickle must serialize it by value (the driver contract imports
    __spark_entry__.py by file path, so executors can't import this
    module; see stateful._make_sessionize_group)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cols = ["user_id", "session_start_us", "session_end_us", "n_events", "value_micros"]
    # value_micros is the 128-bit session total (tables.micros128
    # convention, round 11 — mirrors the applyInPandasWithState twin)
    state_schema = (
        "session_start_us long, last_ts_us long, n_events long, "
        "value_micros decimal(38,0)"
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.session = handle.getValueState("session", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import decimal

            import pandas as pd

            (user_id,) = key
            pdf = pd.concat(list(rows)).sort_values(["ts_us", "event_id"])
            if self.session.exists():
                start, last, n, micros = self.session.get()
                # the 128-bit state field arrives as decimal.Decimal;
                # Python ints are unbounded, so the accumulator stays int
                micros = int(micros)
                # drop the stale timer; a fresh one is registered below
                for t in self.handle.listTimers():
                    self.handle.deleteTimer(t)
            else:
                start = last = None
                n = micros = 0

            closed = []
            for t, v in zip(pdf["ts_us"].to_numpy(), pdf["value_micros"].to_numpy()):
                t, v = int(t), int(v)
                # gap on floor-seconds: identical to the batch/oracle formula
                if last is not None and t // 1_000_000 - last // 1_000_000 > gap_seconds:
                    closed.append([user_id, start, last, n, decimal.Decimal(micros)])
                    start, n, micros = None, 0, 0
                if start is None:
                    start = t
                last = t
                n += 1
                micros += v

            self.session.update((start, last, n, decimal.Decimal(micros)))
            # event-time timer: fire when the watermark passes last + gap
            self.handle.registerTimer(last // 1000 + gap_seconds * 1000)
            if closed:
                yield pd.DataFrame(closed, columns=cols)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            (user_id,) = key
            if self.session.exists():
                start, last, n, micros = self.session.get()
                self.session.clear()
                yield pd.DataFrame(
                    [[user_id, start, last, n, micros]], columns=cols
                )

        def close(self):
            pass

    return SessionProcessor()


def sessionize_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """30-minute-gap sessionization via ``transformWithStateInPandas``.

    ``events``: streaming DataFrame with (event_id, ts, user_id, value).
    Returns the closed-session stream with the same schema/quantization
    as ``stateful.sessionize_stateful`` (and therefore the same oracle).

    Poison-row contract mirrored from the applyInPandasWithState twin
    (round-5 hardening, applied here round 6 so the twins cannot diverge
    the day this path unlocks): NULL event-times are dropped (no position
    on the event-time axis), and NULL/NaN/Inf/1e308 values contribute 0
    to session_value but still count as events (the COUNT-AS-ZERO
    contract; windowed aggregates use DROP-ROW instead — see
    streaming/windows.tumbling_counts) — without the gate the
    micros cast replays the same poisoned micro-batch forever under ANSI.
    """
    finite_val = F.col("value").isNotNull() & quantizable("value")
    prepared = (
        events.where(F.col("ts").isNotNull() & bounded_ts("ts"))
        .withWatermark("ts", watermark)
        .select(
            "ts",
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.when(finite_val, F.round(F.col("value") * 1_000_000, 0).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("value_micros"),
        )
    )
    raw = prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_session_processor(GAP_SECONDS),
        outputStructType=_RAW_OUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
    return raw.select(
        "user_id",
        F.timestamp_micros("session_start_us").alias("session_start"),
        F.timestamp_micros("session_end_us").alias("session_end"),
        "n_events",
        F.round(F.col("value_micros") / 1_000_000.0, 2).alias("session_value"),
    )


def replay_sessionize_tws(spark, sf_dir: str, checkpoint_dir: str, source_dir: str) -> DataFrame:
    """File-replay harness mirroring stateful.replay_sessionize, with the
    RocksDB state store transformWithState requires."""
    from graph_vulcan_assets_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    events.coalesce(1).write.mode("overwrite").parquet(source_dir)
    stream = spark.readStream.schema(events.schema).parquet(source_dir)
    name = "tws_sessions_" + str(abs(hash((sf_dir, source_dir))))
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(min(int(prev_shuffle), 32)))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        q = (
            sessionize_tws(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return spark.table(name)


def tws_available() -> bool:
    """transformWithState's Python↔JVM state server speaks protobuf; the
    image ships no ``google.protobuf``, so the operator is wired but
    unexecutable here (same honesty policy as the Kafka source, S1). On a
    real deployment (pip install protobuf) everything below runs as-is."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if tws_available():  # pragma: no cover — image has no protobuf
    from graph_vulcan_assets_spark.registry import ORACLE, query

    @query("q_stream_sessionize_tws", oracle=None)
    def q_stream_sessionize_tws(spark, sf_dir: str) -> DataFrame:
        """Stateful streaming sessionization via transformWithStateInPandas
        (T5, Spark-4-native form), oracle-checked against the same
        deterministic closed-session SQL as q_stream_sessionize: every
        non-final session, plus final sessions whose timeout the
        end-of-stream watermark passed."""
        import tempfile

        base = tempfile.mkdtemp(prefix="gvas_tws_sess_")
        return replay_sessionize_tws(spark, sf_dir, base + "/ckpt", base + "/src")

    # same emission semantics ⇒ same oracle text as q_stream_sessionize
    ORACLE["q_stream_sessionize_tws"] = ORACLE["q_stream_sessionize"]
