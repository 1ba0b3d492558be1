"""Window functions (SURVEY.md §2.5).

The reference applies events sequentially so "later message wins" and
"first_seen never moves" fall out of processing order
(stream/kafka/kafka.go:69-105; inventory/inventory_test.go:407-415,932-940).
In a distributed batch replay those become per-key windows ordered by
(ts, event_id) — the deterministic stand-in for (partition, offset).

Scale notes: every window here partitions by a key (user_id / event_type),
so the sort is per-partition after one hash shuffle — no global sort. A
window with no PARTITION BY would serialize on a single task and is avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import (
    FINITE_VALUE_SQL,
    epoch_sec_sql,
    finite_values,
    load_table,
    micros128,
    plausible_times,
    plausible_ts_sql,
)

# ts-EMITTING queries gate the event-time domain (tables.plausible_times,
# round 6): an ancient timestamp (corrupt bits) crosses the parquet
# calendar rebase into year 0, which the driver's collect() cannot even
# represent — the gate is mirrored into each oracle so both engines agree
# on which rows are corrupt. Queries that only ORDER by ts (q_win_rank,
# q_win_topk_group, q_win_distribution emit no timestamp) compare
# raw micros and need no gate.


@query(
    "q_win_last_event",
    oracle=f"""
    SELECT user_id, event_id, event_type, ts, round(value, 2) AS value
    FROM (
      SELECT user_id, event_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE {plausible_ts_sql()})
    WHERE rn = 1
    """,
)
def q_win_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last event per key (W1): later messages win.

    Replaces the reference's strictly-ordered sequential handler
    (stream/kafka/kafka.go:69-105): reduce each key to its latest event by
    (ts, event_id) — the batch form of last-write-wins upsert.

    Argmax is an AGGREGATE, not a window (round 7): ``max_by`` with a
    (ts, event_id) ordering struct compiles to a partial/final aggregate
    pair (SortAggregate — the struct buffer is not hash-mutable, so the
    map side sorts by the GROUP KEY only, spillable) — the shuffle
    carries ONE candidate row per (user, map partition) instead of every
    event, and a hot key reduces map-side, so skew cannot serialize a
    full (ts, event_id) partition sort the way the old
    row_number-over-sorted-partition plan could at 100 TB. Measured
    honestly at sf0.1/local[32] (same-session A/B, min of 5): aggregate
    0.42 s vs window 0.35 s — the two-phase overhead costs ~0.07 s where
    the shuffle is free, and buys a 20x shuffle-volume reduction
    (users x partitions vs every event) plus skew immunity where it is
    not. NULL-ts
    ordering matches the oracle's DESC NULLS LAST: a struct with a NULL
    leading field compares BELOW any non-NULL ts, so NULL-ts rows win
    only in all-NULL groups, where the event_id field breaks the tie.
    """
    e = plausible_times(load_table(spark, sf_dir, "events"))
    best = F.max_by(
        F.struct("event_id", "event_type", "ts", "value"),
        F.struct("ts", "event_id"),
    )
    return (
        e.groupBy("user_id")
        .agg(best.alias("b"))
        .select(
            "user_id",
            F.col("b.event_id").alias("event_id"),
            F.col("b.event_type").alias("event_type"),
            F.col("b.ts").alias("ts"),
            F.round(F.col("b.value"), 2).alias("value"),
        )
    )


@query(
    "q_win_first_seen",
    oracle=f"""
    SELECT event_id, user_id, ts,
           min(ts) OVER (PARTITION BY user_id) AS first_seen
    FROM events WHERE {plausible_ts_sql()}
    """,
)
def q_win_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen per key (W2): `first_seen` fixed at creation.

    Reference contract: update keeps FirstSeen (inventory_test.go:407-415).
    """
    e = plausible_times(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id")
    return e.select(
        "event_id", "user_id", "ts", F.min("ts").over(w).alias("first_seen")
    )


@query(
    "q_win_rank",
    oracle="""
    SELECT event_id, event_type, round(value, 2) AS value,
           rank()       OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk,
           dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS drnk,
           ntile(4)     OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS quartile
    FROM events
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family (W3): rank / dense_rank / ntile with total order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return e.select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_win_lag_lead",
    oracle=f"""
    SELECT event_id, user_id, ts,
           round(value, 2) AS value,
           round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
           round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value
    FROM events WHERE ts IS NOT NULL AND {plausible_ts_sql()}
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family (W4): lag/lead — "previous state" per key."""
    # NULL event-times have no position on the ordering axis; Spark sorts
    # them NULLS FIRST ASC while DuckDB sorts NULLS LAST, so lag/lead of
    # every neighbor would differ per engine — excluded on both sides
    e = plausible_times(load_table(spark, sf_dir, "events")).where(
        F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@query(
    "q_win_running_sum",
    oracle=f"""
    SELECT event_id, user_id, ts,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / 1000000.0, 4) AS running_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events WHERE ts IS NOT NULL AND {FINITE_VALUE_SQL}
          AND {plausible_ts_sql()}
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals (W5): cumulative ROWS frame. NaN/Inf samples are
    gated out (finite_values, mirrored in the oracle) — one would
    otherwise kill the micros cast or poison every later running total
    in its partition. NULL event-times are excluded on both sides (the
    NULLS FIRST/LAST ordering divergence would shift every running total
    after them)."""
    e = plausible_times(finite_values(load_table(spark, sf_dir, "events"))).where(
        F.col("ts").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        # integer-micros before the cumulative sum: a raw-double running
        # total depends on accumulation order, so the 4-decimal round can
        # flip between engines on long partitions
        F.round(
            # 128-bit accumulator (tables.micros128): a cumulative frame is
            # the WORST overflow shape — it sums the whole partition prefix
            F.sum(micros128("value")).over(w)
            / 1000000.0,
            4,
        ).alias("running_sum"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "q_win_range_frame",
    oracle=f"""
    SELECT event_id, event_type, ts,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                   OVER (PARTITION BY event_type ORDER BY epoch_sec
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                 / 1000000.0, 4) AS hour_sum
    FROM (SELECT event_id, event_type, ts, value,
                 -- exact floor-epoch-seconds (round-11 time-edge probe):
                 -- floor(epoch(ts)) loses one second to double rounding
                 -- at year-1583/9999 magnitudes (tables.epoch_sec_sql)
                 {epoch_sec_sql('ts')} AS epoch_sec
          FROM events WHERE ts IS NOT NULL AND {FINITE_VALUE_SQL}
            AND {plausible_ts_sql()})
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (W5): trailing 1-hour sum per event type.

    The frame is defined on epoch seconds (identical truncation in both
    engines) so frame membership is bit-identical. NaN/Inf samples and
    NULL event-times are gated out (finite_values + ts IS NOT NULL,
    mirrored in the oracle — a NULL epoch_sec row sorts NULLS FIRST in
    Spark, NULLS LAST in DuckDB).

    Plan shape (round 11): the trailing sum is computed as the
    DIFFERENCE OF TWO GROWING FRAMES — sum over RANGE(-inf, 0) minus
    sum over RANGE(-inf, -3601) — NOT a bounded sliding frame. Spark
    has no retractable aggregates, so a bounded sliding frame
    re-accumulates the whole frame per row: O(rows x frame-depth),
    measured 14 s (long) / 132 s (decimal) on a 200k-row dense battery
    where every trailing hour holds 3600 rows. Growing frames are
    accumulate-only and O(rows): the same battery runs in 2.3 s with
    the 128-bit accumulator — 58x — and at 100 TB a dense stream's
    frame depth is unbounded, so the sliding form would be quadratic
    cliff, not constant-factor. DuckDB needs no such rewrite (its
    windowed sum uses a segment tree), so the oracle keeps the natural
    sliding-frame SQL; both compute the identical exact integer totals.
    The n_in_frame count gate reproduces the sliding form's NULL
    semantics exactly (an all-NULL or empty frame must yield NULL,
    where a bare difference would yield 0); counts use the same two
    growing frames. Both facts pinned in tests/test_agg_edges.py.
    """
    e = plausible_times(finite_values(load_table(spark, sf_dir, "events"))).where(
        F.col("ts").isNotNull()
    ).withColumn(
        "epoch_sec", F.col("ts").cast("long")
    )
    hi = (
        Window.partitionBy("event_type")
        .orderBy("epoch_sec")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lo = (
        Window.partitionBy("event_type")
        .orderBy("epoch_sec")
        .rangeBetween(Window.unboundedPreceding, -3601)
    )
    micros = micros128("value")
    in_frame = F.count("value").over(hi) - F.coalesce(
        F.count("value").over(lo), F.lit(0)
    )
    trailing = F.sum(micros).over(hi) - F.coalesce(
        F.sum(micros).over(lo), F.lit(0).cast("decimal(38,0)")
    )
    return e.select(
        "event_id",
        "event_type",
        "ts",
        F.round(
            F.when(in_frame > 0, trailing) / 1000000.0,
            4,
        ).alias("hour_sum"),
    )


@query(
    "q_sessionize",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       -- floor-SECOND gap, matching Spark's cast(ts as
                       -- long) difference EXACTLY (round-11 time-edge
                       -- probe): the old raw epoch() difference was
                       -- fractional, so a gap whose floor is exactly
                       -- 1800 s with increasing sub-second fraction
                       -- split the session here but not on Spark —
                       -- hostile events rows 9504/9505 pin it
                       OR {epoch_sec_sql('ts')}
                          - {epoch_sec_sql('lag(ts) OVER w')} > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL AND {FINITE_VALUE_SQL}
            AND {plausible_ts_sql()}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT user_id, event_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_no
      FROM marked)
    SELECT user_id, session_no, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT)) / 1000000.0, 2)
             AS session_value
    FROM sessioned GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (W-family extension): 30-minute-gap sessions.

    The classic lag + cumulative-sum-of-gap-markers pattern: a new session
    starts when the gap to the previous event exceeds the threshold; the
    running sum of start-markers numbers the sessions. One shuffle on
    user_id serves both windows and the final aggregate. The streaming
    equivalent is session_window() (streaming/windows.py). NaN/Inf
    samples and NULL event-times are gated out (finite_values +
    ts IS NOT NULL, mirrored in the oracle — NULL ts sorts NULLS FIRST
    in Spark vs NULLS LAST in DuckDB, renumbering every session).
    """
    e = plausible_times(finite_values(load_table(spark, sf_dir, "events"))).where(
        F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = e.withColumn("new_session", new_session).withColumn(
        "session_no", F.sum("new_session").over(cum)
    )
    micros = micros128("value")
    return sessioned.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum(micros) / 1000000.0, 2).alias("session_value"),
    )


@query(
    "q_win_topk_group",
    oracle="""
    SELECT user_id, event_id, event_type, round(value, 2) AS value
    FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
    WHERE rn <= 3
    """,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (W6): the per-entity pagination generalization.

    At scale Catalyst rewrites rank<=k windows into a per-partition top-k
    (WindowGroupLimit) before the shuffle, so only k rows per key per task
    move.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))
    )


@query(
    "q_win_distribution",
    oracle="""
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution family (W3 completion): percent_rank / cume_dist —
    the per-partition empirical CDF, same single shuffle as the ranking
    family. NULL values are excluded on both sides: the ASC ordering
    puts NULLs FIRST in Spark and LAST in DuckDB, which would shift
    every row's rank position (NaN needs no exclusion — both engines
    sort it greater than every number)."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_win_ratio_to_report",
    oracle="""
    WITH rev AS (
      SELECT n_regionkey, n_name,
             sum(CAST(round(o_totalprice * 1000000, 0) AS BIGINT)) AS rev_micros
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_regionkey, n_name)
    SELECT n_name, CAST(rev_micros AS BIGINT) AS rev_micros,
           CAST(round(CAST(rev_micros AS DOUBLE)
                      / sum(rev_micros) OVER (PARTITION BY n_regionkey)
                      * 1000000, 0) AS BIGINT) AS share_ppm
    FROM rev
    """,
)
def q_win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each nation's share of its
    region's order revenue — a window over an ALREADY-AGGREGATED relation,
    the share-of-parent rollup every report ends with.

    The window input is nation-cardinality (25 rows), not the fact table:
    aggregate first, window the summary. Ordering: at 100 TB the orders
    scan pays one partial+final aggregate; the share window shuffles 25
    rows. Share is emitted in integer parts-per-million (exact BIGINT
    sums, one double division, round-to-integer — no float column).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 1000000, 0).cast("long")).alias(
                "rev_micros"
            )
        )
    )
    w = Window.partitionBy("n_regionkey")
    return rev.select(
        "n_name",
        F.col("rev_micros").cast("long").alias("rev_micros"),
        F.round(F.col("rev_micros").cast("double") / F.sum("rev_micros").over(w) * 1000000, 0)
        .cast("long")
        .alias("share_ppm"),
    )
