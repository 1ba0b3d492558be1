"""Temporal / streaming-semantics queries in batch form (SURVEY.md §2.9).

The reference maintains temporal state by applying events sequentially
(tombstone → expire flow at cmd/graph-vulcan-assets/main.go:95-112,270-364).
These queries express the same semantics as declarative batch dataflow over
the `events` table so a SQL oracle can check them; the streaming module
applies the identical logic incrementally per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import (
    FINITE_VALUE_SQL,
    bounded_times,
    bounded_ts_sql,
    finite_values,
    floor_div_sql,
    load_table,
    micros128,
    plausible_times,
    plausible_ts_sql,
)


@query(
    "q_tombstone_expire",
    oracle=f"""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type = 'error' AS expired
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE {plausible_ts_sql()})
    WHERE rn = 1
    """,
)
def q_tombstone_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone expiry replay (T3): null-value ⇒ expire, last event wins.

    Reference: a nil message value routes to the expire flow
    (cmd/graph-vulcan-assets/main.go:99-104); expiring a nonexistent entity
    is a silent no-op (main.go:276-295). Batch replay: reduce to the last
    event per key; the key is expired iff that event is a tombstone
    (here: event_type = 'error' stands in for value IS NULL).
    """
    # argmax-as-aggregate (round 7, same rationale as q_win_last_event):
    # max_by gives a partial/final aggregate pair — skew-immune, shuffle
    # carries one candidate per (key, map partition), no (ts, event_id)
    # ordering sort
    e = plausible_times(load_table(spark, sf_dir, "events"))
    best = F.max_by(
        F.struct("event_id", "ts", "event_type"), F.struct("ts", "event_id")
    )
    return (
        e.groupBy("user_id")
        .agg(best.alias("b"))
        .select(
            "user_id",
            F.col("b.event_id").alias("last_event_id"),
            F.col("b.ts").alias("last_ts"),
            (F.col("b.event_type") == "error").alias("expired"),
        )
    )


@query(
    "q_cascade_expire",
    oracle="""
    WITH owner_state AS (
      SELECT o_orderkey, bool_or(o_orderstatus <> 'F') AS any_active
      FROM orders GROUP BY o_orderkey),
    expired_assets AS (
      SELECT o_orderkey FROM owner_state WHERE NOT any_active)
    SELECT l.l_orderkey, l.l_linenumber, TRUE AS edge_expired
    FROM lineitem l JOIN expired_assets x ON l.l_orderkey = x.o_orderkey
    """,
)
def q_cascade_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade expiry (T7) as batch dataflow.

    Reference order (cmd/graph-vulcan-assets/main.go:270-364): expire owns →
    if no owns relation remains active, expire the asset → expire all its
    unexpired edges. Modeled on TPC-H: an order's owner is "active" while
    o_orderstatus ≠ 'F'; assets with no active owner expire, and the expiry
    cascades to their lineitem edges. Two stages: a hash aggregate (any
    active?) and one join — the same shape the streaming foreachBatch runs.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    expired = (
        o.groupBy("o_orderkey")
        .agg(F.expr("any(o_orderstatus <> 'F')").alias("any_active"))
        .where(~F.col("any_active"))
        .select("o_orderkey")
    )
    return li.join(expired, li.l_orderkey == expired.o_orderkey).select(
        "l_orderkey", "l_linenumber", F.lit(True).alias("edge_expired")
    )


@query(
    "q_time_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*) AS n,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT)) / 1000000.0, 2)
             AS sum_value
    FROM events
    WHERE ts IS NOT NULL AND {FINITE_VALUE_SQL} AND {plausible_ts_sql()}
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_time_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregation (T4), batch-equivalent form.

    The reference has no event-time windows; this is the engine extension.
    Spark's `window()` with a 1-hour tumble aligns to the epoch, identical
    to date_trunc('hour') for whole-hour windows. In streaming mode the same
    expression runs with a watermark (see streaming module).
    """
    # NULL event-times cannot belong to any time window: window() drops
    # them in Spark by construction; the explicit filter makes the
    # contract visible and the oracle mirrors it (ts IS NOT NULL)
    e = plausible_times(finite_values(load_table(spark, sf_dir, "events"))).where(
        F.col("ts").isNotNull()
    )
    # integer-micros quantization BEFORE the sum (the discipline every
    # other query in this file uses): summing raw doubles depends on
    # accumulation order, so the 2-decimal round could flip near a .005
    # boundary between engines/partition counts — a nondeterministic
    # oracle mismatch waiting for the right row count; finite_values
    # gates NaN/Inf samples out before the cast (mirrored in the oracle)
    # 128-bit accumulator (tables.micros128): two near-bound corrupt
    # readings in one window would overflow sum(BIGINT) and ANSI-kill
    # the query while the oracle's HUGEINT sails on
    micros = micros128("value")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(micros) / 1000000.0, 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_time_sliding",
    oracle=f"""
    WITH ex AS (
      SELECT event_type,
             CAST(round(value * 1000000, 0) AS BIGINT) AS v_micros,
             -- FLOOR bucket index (round-11 time-edge probe): DuckDB's
             -- // truncates toward zero, so pre-1970 non-slide-aligned
             -- timestamps landed in the NEXT window here while Spark's
             -- window() floor-aligns (4 measured-divergent cases;
             -- hostile events row 9506 pins it). floor_div_sql is the
             -- exact BIGINT floor over the slide in MICROSECONDS —
             -- one division, no compounding truncation.
             ({floor_div_sql('epoch_us(ts)', 1_800_000_000)} - i) * 1800000
               AS start_ms
      FROM events, unnest(range(4)) AS t(i)
      WHERE ts IS NOT NULL AND {FINITE_VALUE_SQL} AND {plausible_ts_sql()})
    SELECT make_timestamp(start_ms * 1000) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           sum(v_micros) / 1000000.0 AS sum_value
    FROM ex GROUP BY window_start, event_type
    """,
)
def q_time_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows, batch form (T4 completion):
    2-hour windows every 30 minutes — each event lands in 4 overlapping
    windows.

    Spark's `window(ts, '2 hours', '30 minutes')` compiles to a JVM-side
    explode of the 4 window instances per row before the aggregate — the
    shuffle carries (window, type) keyed partial aggregates, so the 4x
    row expansion is collapsed map-side. The oracle reproduces Spark's
    epoch-aligned window arithmetic exactly: instance i's start is
    (floor(epoch_ms / slide) - i) * slide for i in 0..3. Value sums are
    exact integer micros, so the hash matches despite the 4-way overlap
    multiplying float additions.

    In streaming mode the same expression runs with a watermark
    (streaming/windows.py); this is the batch-equivalent proof.
    NULL event-times are windowless — dropped on both sides.
    """
    e = plausible_times(finite_values(load_table(spark, sf_dir, "events"))).where(
        F.col("ts").isNotNull()
    )
    return (
        e.groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.sum(micros128("value")) / 1000000.0).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_rollup_cascade",
    oracle=f"""
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS m, event_type,
             count(*) AS n,
             sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS v_micros
      FROM events
      WHERE {FINITE_VALUE_SQL} AND {plausible_ts_sql()} GROUP BY 1, 2),
    hour AS (
      SELECT date_trunc('hour', m) AS h, event_type,
             sum(n) AS n, sum(v_micros) AS v_micros
      FROM minute GROUP BY 1, 2),
    day AS (
      SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS d, event_type,
             sum(n) AS n, sum(v_micros) AS v_micros
      FROM hour GROUP BY 1, 2)
    SELECT d, event_type, CAST(n AS BIGINT) AS n,
           -- the cascade carries EXACT 128-bit micros internally (HUGEINT
           -- here, DECIMAL(38,0) on the Spark side — round 11: a BIGINT
           -- carrier would make both engines error on a day total past
           -- int64, hostile events rows 9501/9502); the EMIT is the
           -- conventional rounded double (no decimal output — the driver
           -- hash is representation-sensitive, round-6/7 lesson)
           round(v_micros / 1000000.0, 2) AS sum_value
    FROM day
    """,
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup cascade (hypertable continuous-aggregate
    shape): events → per-minute → per-hour → per-day, where EACH LEVEL
    aggregates the PREVIOUS level's output, never the raw stream.

    The point at 100 TB: the raw table is touched exactly once (the
    minute level); the hour level reads minutes (~1440× smaller), the day
    level reads hours — so maintaining a full resolution pyramid costs
    barely more than the finest level alone. This requires every
    aggregate to be ALGEBRAIC (count/sum re-aggregate losslessly;
    avg/percentile must be carried as sum+count / sketches). The oracle
    computes the same cascade; the sums are exact integer micros, so
    re-aggregation associativity is exact, not approximate.
    """
    e = plausible_times(finite_values(load_table(spark, sf_dir, "events")))
    minute = e.groupBy(
        F.date_trunc("minute", "ts").alias("m"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        # 128-bit cascade (tables.micros128): each level re-aggregates the
        # previous level's EXACT integer totals; DECIMAL(38,0) mirrors the
        # oracle's HUGEINT so a day whose total exceeds int64 still rolls
        # up instead of ANSI-killing the pyramid
        F.sum(micros128("value")).alias("v_micros"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "m").alias("h"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v_micros").cast("decimal(38,0)").alias("v_micros"))
    day = hour.groupBy(
        F.date_trunc("day", "h").alias("d"), "event_type"
    ).agg(
        F.sum("n").cast("long").alias("n"),
        # exact 128-bit day total, emitted as the conventional rounded
        # double (no decimal output — driver-hash convention)
        F.round(F.sum("v_micros") / 1000000.0, 2).alias("sum_value"),
    )
    return day


@query(
    "q_session_window",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WHERE ts IS NOT NULL AND {FINITE_VALUE_SQL} AND {bounded_ts_sql()}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT user_id, ts, value,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sno
      FROM marked)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT)) / 1000000.0, 2)
             AS sum_value
    FROM sessioned GROUP BY user_id, sno
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows, batch form (T4 completion): Spark's
    ``session_window(ts, '30 minutes')`` aggregate — the idiomatic
    engine-managed form of what q_sessionize builds by hand with
    lag + cumulative markers.

    Semantics pinned by the oracle: session_window merges events whose
    gap is STRICTLY LESS than 30 min (an event exactly at prev + gap
    starts a new session — ``>=`` in the oracle's lag test, unlike the
    lag-sessionizers' ``>`` on floor-seconds), and the emitted window end
    is last_event + gap, not last_event. Value sums quantize to integer
    micros so the 2-decimal rounding is summation-order-independent.

    Scale shape: compiles to a partial/final session-merge aggregate pair
    shuffled once on user_id (explain shows UpdatingSessionsIterator /
    MergingSessionsIterator) — no window function, no per-key sort job.
    The same expression runs streaming with a watermark
    (streaming/windows.session_counts). NULL event-times are
    windowless — dropped on both sides.
    """
    # BOUNDED ts domain (tables.py domain note): session_window EMITS a
    # derived instant (end = last event + gap), which crosses datetime.max
    # for events near year 9999 — unlike the raw-ts-emitting queries,
    # which take the full representable domain
    e = bounded_times(finite_values(load_table(spark, sf_dir, "events"))).where(
        F.col("ts").isNotNull()
    )
    micros = micros128("value")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(micros).alias("v_micros"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            F.round(F.col("v_micros") / 1_000_000.0, 2).alias("sum_value"),
        )
    )
