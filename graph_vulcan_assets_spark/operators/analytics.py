"""Event-sequence analytics: funnels and cohort retention.

The classic product-analytics operators over an event stream — ordered
multi-step funnels and first-touch cohort retention. The reference's
events are asset lifecycle messages (stream/stream.go) and its only
"analytics" is final-state readback; these generalize the same per-key
temporal ordering machinery (T2/W1) into the aggregate shapes every
event warehouse runs.

Scale shapes: every stage is a per-user min() — a hash aggregate with a
map-side partial phase keyed on user_id — and the stage-to-stage
"happened after" constraints are equi-joins on user_id carrying one row
per user. Nothing ever materializes per-event pairs; the event table is
touched once per funnel step with the step filter pushed to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import (
    FINITE_VALUE_SQL,
    attach_scalar,
    bounded_times,
    bounded_ts_sql,
    finite_values,
    load_table,
    plausible_times,
    plausible_ts_sql,
)


@query(
    "q_funnel",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, ts FROM events
                WHERE {plausible_ts_sql()}),
    u AS (SELECT DISTINCT user_id FROM ev),
    v AS (
      SELECT user_id, min(ts) AS first_view
      FROM ev WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS first_click
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id)
    SELECT u.user_id, v.first_view, c.first_click, p.first_purchase,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     WHEN v.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: per user, the first view,
    the first click strictly AFTER that view, the first purchase strictly
    after that click, and the funnel stage reached (0–3).

    Each step is one filtered scan + per-user min (map-side partial), and
    each ordering constraint is an equi-join against the previous step's
    one-row-per-user frame — never an event-pair join. Step filters push
    to the parquet scan; at 100 TB each funnel stage reads one
    event-type's row groups, not the stream.
    """
    e = plausible_times(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts"
    )
    u = e.select("user_id").distinct()
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            F.when(F.col("first_purchase").isNotNull(), 3)
            .when(F.col("first_click").isNotNull(), 2)
            .when(F.col("first_view").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("stage"),
        )
    )


@query(
    "q_retention_cohorts",
    oracle=f"""
    WITH ev AS (SELECT user_id, ts FROM events WHERE {plausible_ts_sql()}),
    first_touch AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM ev GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7
               AS week_n
      FROM ev e JOIN first_touch f ON e.user_id = f.user_id)
    SELECT cohort_week, CAST(week_n AS BIGINT) AS week_n,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity GROUP BY cohort_week, week_n
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch cohort retention: users grouped by the week they first
    appeared, counted in every subsequent week they were active — the
    retention-matrix query behind every growth dashboard.

    Two shuffles, both on user_id (first-touch min, then the distinct
    user-week de-dup); the final cohort×week aggregate is
    cardinality-bounded by weeks², not events. Week arithmetic is whole
    days of epoch-aligned Monday truncations in both engines, so the
    integer week offsets hash-match exactly.
    """
    e = plausible_times(load_table(spark, sf_dir, "events")).select("user_id", "ts")
    first_touch = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(first_touch, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_n"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_n").agg(
        F.count("*").cast("long").alias("n_active_users")
    )


@query(
    "q_time_weighted_avg",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 1000, 0) AS BIGINT) AS value_milli,
             (lead(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              - epoch_us(ts)) // 1000 AS dt_ms
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND {FINITE_VALUE_SQL}
            AND {plausible_ts_sql()}),
    k AS (SELECT * FROM seq WHERE dt_ms IS NOT NULL)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt_ms) AS BIGINT) AS total_ms,
           -- 128-bit product: value_milli * dt_ms overflows BIGINT for
           -- values far inside the measure gate (1e10 * 1h = 3.6e19);
           -- HUGEINT here mirrors Spark's DECIMAL(38,0) product
           CAST(round(CAST(sum(CAST(value_milli AS HUGEINT) * dt_ms) AS DOUBLE)
                      / sum(dt_ms), 0)
                AS BIGINT) AS twap_milli
    FROM k GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value is
    held until the user's next event and weighted by that holding time —
    the right average for irregularly-sampled state (prices, gauges,
    sensor readings), where the plain mean over-weights busy periods.

    One window pass (lead of the event time, partitioned by user — the
    same per-key ordering primitive as W4) then a per-user aggregate.
    Exactness: value quantized to integer millis, interval to integer ms;
    their products and sums stay in BIGINT (≤1.5e17 at this scale), so
    the weighted sum is summation-order independent and the final ratio
    is one double division + round-to-integer — hash-identical in both
    engines.

    Corrupt-sample gate (mirrored in the oracle): rows with NULL ts,
    NULL value, or a non-finite value are dropped BEFORE the window — a
    NaN value hits the milli CAST (ANSI CAST_OVERFLOW kills the job),
    one ±Inf sample would poison its user's whole weighted sum, and a
    NULL ts cannot anchor a holding interval (and would also sort
    NULLS FIRST in Spark vs NULLS LAST in DuckDB, silently skewing the
    neighbors' intervals differently per engine).
    """
    from pyspark.sql import Window

    e = plausible_times(finite_values(load_table(spark, sf_dir, "events"))).where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.round(F.col("value") * 1000, 0).cast("long").alias("value_milli"),
        ((F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")) / 1000)
        .cast("long")
        .alias("dt_ms"),
    ).where(F.col("dt_ms").isNotNull())
    # the weighted sum runs in DECIMAL(38,0): a BIGINT product overflows
    # for values far inside the measure gate (value 1e10 -> milli 1e13,
    # one hour -> dt 3.6e6 ms, product 3.6e19 > 9.22e18) — 128-bit keeps
    # the sum exact and order-independent; DuckDB mirrors with HUGEINT
    weighted = F.col("value_milli").cast("decimal(38,0)") * F.col("dt_ms")
    return seq.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("dt_ms").cast("long").alias("total_ms"),
        F.round(F.sum(weighted).cast("double") / F.sum("dt_ms"), 0)
        .cast("long")
        .alias("twap_milli"),
    )



def _hour_spine(hourly):
    """Complete (event_type x hour) spine over the global hour bounds —
    shared by the gap-fill and interpolation queries so both fill
    policies agree about which hours are gaps (a spine-semantics change
    applied to one but not the other would make locf and linear fill
    disagree about gap positions). types x hours rows; bounds broadcast."""
    bounds = hourly.agg(
        F.struct(F.min("hour").alias("h0"), F.max("hour").alias("h1")).alias("b")
    )
    return (
        attach_scalar(hourly.select("event_type").distinct(), bounds, "__b")
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("__b.h0"), F.col("__b.h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )


@query(
    "q_timeseries_gapfill",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hour,
             count(*) AS n,
             CAST(sum(CAST(round(value * 1000, 0) AS BIGINT)) AS BIGINT)
               AS sum_value_milli
      FROM events WHERE {FINITE_VALUE_SQL} AND {bounded_ts_sql()}
      GROUP BY event_type, date_trunc('hour', ts)),
    bounds AS (
      SELECT min(hour) AS h0, max(hour) AS h1 FROM hourly),
    spine AS (
      SELECT t.event_type, s.h AS hour
      FROM (SELECT DISTINCT event_type FROM hourly) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                  FROM bounds) s),
    joined AS (
      SELECT sp.event_type, sp.hour,
             coalesce(h.n, 0) AS n,
             h.sum_value_milli,
             (h.n IS NULL) AS gap
      FROM spine sp LEFT JOIN hourly h USING (event_type, hour))
    SELECT event_type, hour, CAST(n AS BIGINT) AS n, gap,
           last_value(sum_value_milli IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS carried_sum_milli
    FROM joined
    """,
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (gap fill + forward fill): hourly counts
    per event_type on a COMPLETE hour spine, with empty hours marked and
    the last observed hourly value-sum carried forward.

    The hypertable `time_bucket_gapfill`/`locf` shape: irregular events →
    regular grid. The spine is built with `sequence()` from the global
    [min, max] hour bounds (a 1-row broadcast) crossed with the distinct
    event types — spine size is types × hours regardless of event count,
    so the explode never amplifies the fact table. Forward fill is
    `last(..., ignoreNulls)` over an hour-ordered window partitioned by
    event_type — bounded partitions (one per type), no single-partition
    window over the raw events.

    Exactness: counts and milli-quantized sums are BIGINTs; the fill
    copies them verbatim — hash-identical in both engines. NaN/Inf
    samples are gated out (finite_values, mirrored in the oracle)
    before the milli cast.
    """
    from pyspark.sql import Window

    # BOUNDED ts domain (tables.py domain note): the spine is sized by
    # max(ts)-min(ts), so one far-future row would explode it — this is
    # the spine-generator data contract, not the general emit gate
    e = bounded_times(finite_values(load_table(spark, sf_dir, "events")))
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 1000, 0).cast("long"))
        .cast("long")
        .alias("sum_value_milli"),
    )
    spine = _hour_spine(hourly)
    joined = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        "sum_value_milli",
        F.col("n").isNull().alias("gap"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour",
        "n",
        "gap",
        F.last("sum_value_milli", ignorenulls=True)
        .over(w)
        .alias("carried_sum_milli"),
    )


@query(
    "q_anomaly_zscore",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE {plausible_ts_sql()}
      GROUP BY event_type, date_trunc('hour', ts)),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n * n) AS BIGINT) AS sq
      FROM hourly GROUP BY event_type),
    scored AS (
      SELECT h.event_type, h.hour, h.n,
             (CAST(h.n AS DOUBLE)
              - CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))
             / sqrt(CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))) AS z
      FROM hourly h JOIN stats USING (event_type)
      WHERE CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE)
            - (CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))
              * (CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE)) > 0)
    SELECT event_type, hour, n,
           CAST(round(z * 1000000, 0) AS BIGINT) AS z_micros,
           (abs(z) > 2.0) AS is_anomaly
    FROM scored
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: z-score of each hour's event count
    against its event_type's own distribution, |z| > 2 flagged.

    The monitoring query a 100 TB ingest runs beside the DQ contract
    (operators/dq.py): per-series statistics come from ONE aggregate over
    the hourly rollup (count, Σn, Σn² — all exact BIGINTs), broadcast
    back onto the series; the z expression is a fixed chain of IEEE ops
    on those exact integers, rounded to integer micros, so the driver
    hash-compare is exact. Series with zero variance are excluded in both
    engines (a constant series has no z-score).
    """
    e = plausible_times(load_table(spark, sf_dir, "events"))
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").cast("long").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sq"),
    )
    cntd = F.col("cnt").cast("double")
    mean = F.col("s").cast("double") / cntd
    var = F.col("sq").cast("double") / cntd - mean * mean
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .where(var > 0)
        .select(
            "event_type",
            "hour",
            "n",
            F.round(z * 1000000, 0).cast("long").alias("z_micros"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


@query(
    "q_timeseries_interpolate",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(sum(CAST(round(value * 1000, 0) AS BIGINT)) AS BIGINT)
               AS v_milli
      FROM events WHERE {FINITE_VALUE_SQL} AND {bounded_ts_sql()}
      GROUP BY event_type, date_trunc('hour', ts)),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM hourly),
    spine AS (
      SELECT t.event_type, s.h AS hour
      FROM (SELECT DISTINCT event_type FROM hourly) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                  FROM bounds) s),
    joined AS (
      SELECT sp.event_type, sp.hour, h.v_milli,
             (h.v_milli IS NULL) AS gap
      FROM spine sp LEFT JOIN hourly h USING (event_type, hour)),
    bracketed AS (
      SELECT event_type, hour, v_milli, gap,
             last_value(v_milli IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             last_value(CASE WHEN v_milli IS NOT NULL THEN hour END
                        IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
             first_value(v_milli IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(CASE WHEN v_milli IS NOT NULL THEN hour END
                         IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
      FROM joined)
    SELECT event_type, hour, gap,
           CASE
             WHEN NOT gap THEN v_milli
             WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
             ELSE CAST(round(
               CAST(prev_v AS DOUBLE)
               + (CAST(next_v AS DOUBLE) - CAST(prev_v AS DOUBLE))
                 * (CAST(date_diff('hour', prev_h, hour) AS DOUBLE)
                    / CAST(date_diff('hour', prev_h, next_h) AS DOUBLE)),
               0) AS BIGINT)
           END AS filled_milli
    FROM bracketed
    """,
)
def q_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill: the second standard fill policy
    beside q_timeseries_gapfill's carry-forward.

    Gap hours get prev + (next − prev)·(Δt/Δtotal) between their
    bracketing observations (NULL at the series edges where no bracket
    exists). Brackets come from two IGNORE NULLS window passes (backward
    last, forward first) over the same bounded per-type partitions as the
    locf query — still no single-partition window, still types × hours
    rows. Arithmetic: exact BIGINT milli inputs, hour offsets as exact
    integers, one fixed double expression rounded back to milli — oracle
    bit-for-bit. NaN/Inf samples are gated out (finite_values, mirrored
    in the oracle) before the milli cast.
    """
    from pyspark.sql import Window

    # BOUNDED ts domain: spine-sized, same contract as q_timeseries_gapfill
    e = bounded_times(finite_values(load_table(spark, sf_dir, "events")))
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(F.round(F.col("value") * 1000, 0).cast("long"))
        .cast("long")
        .alias("v_milli")
    )
    spine = _hour_spine(hourly)
    joined = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type", "hour", "v_milli", F.col("v_milli").isNull().alias("gap")
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v_milli").isNotNull(), F.col("hour"))
    b = joined.select(
        "event_type",
        "hour",
        "v_milli",
        "gap",
        F.last("v_milli", ignorenulls=True).over(back).alias("prev_v"),
        F.last(obs_hour, ignorenulls=True).over(back).alias("prev_h"),
        F.first("v_milli", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(obs_hour, ignorenulls=True).over(fwd).alias("next_h"),
    )
    # hour offsets as exact integers (epoch-hour difference)
    dh = (F.unix_micros(F.col("hour")) - F.unix_micros(F.col("prev_h"))) / F.lit(
        3_600_000_000
    )
    dtot = (
        F.unix_micros(F.col("next_h")) - F.unix_micros(F.col("prev_h"))
    ) / F.lit(3_600_000_000)
    lerp = F.round(
        F.col("prev_v").cast("double")
        + (F.col("next_v").cast("double") - F.col("prev_v").cast("double"))
        * (dh.cast("long").cast("double") / dtot.cast("long").cast("double")),
        0,
    ).cast("long")
    filled = (
        F.when(~F.col("gap"), F.col("v_milli"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(lerp)
    )
    return b.select("event_type", "hour", "gap", filled.alias("filled_milli"))
