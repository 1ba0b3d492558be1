"""Data-quality expectation checks (SURVEY.md §2.16) — the Deequ-shaped
validation layer a 100 TB ingest runs before publishing a table.

The reference hard-fails on single-row anomalies inline (duplicated
asset, cmd/graph-vulcan-assets/main.go:151-166; un-decodable payloads
routed to the retry loop). At warehouse scale validation is instead a
BATCH CONTRACT: one pass over the table computes every metric, each
metric is compared to its declared bound, and the (check, observed,
bound, passed) report decides whether the partition ships. This module
is that pattern over the events table.

Scale shape: ALL metrics come out of ONE aggregate over ONE scan (the
same single-pass trick as operators/profiling.py) — adding a check adds
an aggregate expression, not a scan. The only caveat is the exact
uniqueness metric (count_distinct expands the aggregate buffer ×2); at
100 TB you'd swap it for the HLL sketch estimate (operators/sketches.py)
and a tolerance bound — the report schema doesn't change.

Determinism: every observed metric is an exact BIGINT count, every bound
a literal, passed a comparison — driver hash-compare is exact.

The check set is chosen to be non-vacuous on the synthetic data: the
domain check FAILS (events carries 'signup'/'error' beyond the declared
domain) while the others pass, so both report branches are exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import FINITE_VALUE_SQL, finite_values, load_table

_DOMAIN = ("click", "view", "purchase")
_MIN_ROWS = 1000


def dq_report(e: DataFrame, min_rows: int = _MIN_ROWS) -> DataFrame:
    """(check, observed, bound, passed) — one row per expectation.

    ``min_rows`` parameterizes the volume floor so the same contract runs
    on full partitions (default) and on micro-batches
    (streaming/incremental.py::gate_with_dq passes a batch-sized bound).
    """
    m = e.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("event_id").alias("n_ids"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("null_users"),
        F.count(F.when(~F.col("event_type").isin(*_DOMAIN), 1)).alias(
            "off_domain"
        ),
        F.count(F.when(F.col("value").isNull(), 1)).alias("null_values"),
        F.count(
            F.when(F.col("ts") < F.lit("2023-01-01").cast("timestamp"), 1)
        ).alias("stale_rows"),
    )

    def check(name: str, observed, bound, passed):
        return F.struct(
            F.lit(name).alias("check"),
            observed.cast("long").alias("observed"),
            F.lit(bound).cast("long").alias("bound"),
            passed.alias("passed"),
        )

    checks = F.array(
        check(
            "row_count_min",
            F.col("n_rows"),
            min_rows,
            F.col("n_rows") >= min_rows,
        ),
        check(
            "event_id_unique",
            F.col("n_ids"),
            0,
            F.col("n_ids") == F.col("n_rows"),
        ),
        check("user_id_complete", F.col("null_users"), 0, F.col("null_users") == 0),
        check(
            "event_type_domain",
            F.col("off_domain"),
            0,
            F.col("off_domain") == 0,
        ),
        check("value_complete", F.col("null_values"), 0, F.col("null_values") == 0),
        check("ts_freshness", F.col("stale_rows"), 0, F.col("stale_rows") == 0),
    )
    return m.select(F.inline(checks))


_ORACLE = f"""
    WITH m AS (
      SELECT count(*) AS n_rows,
             count(DISTINCT event_id) AS n_ids,
             count(*) FILTER (user_id IS NULL) AS null_users,
             count(*) FILTER (event_type NOT IN ('click', 'view', 'purchase'))
               AS off_domain,
             count(*) FILTER (value IS NULL) AS null_values,
             count(*) FILTER (ts < TIMESTAMP '2023-01-01') AS stale_rows
      FROM events)
    SELECT 'row_count_min' AS "check", CAST(n_rows AS BIGINT) AS observed,
           CAST({_MIN_ROWS} AS BIGINT) AS bound, n_rows >= {_MIN_ROWS} AS passed FROM m
    UNION ALL
    SELECT 'event_id_unique', CAST(n_ids AS BIGINT), 0, n_ids = n_rows FROM m
    UNION ALL
    SELECT 'user_id_complete', CAST(null_users AS BIGINT), 0, null_users = 0 FROM m
    UNION ALL
    SELECT 'event_type_domain', CAST(off_domain AS BIGINT), 0, off_domain = 0 FROM m
    UNION ALL
    SELECT 'value_complete', CAST(null_values AS BIGINT), 0, null_values = 0 FROM m
    UNION ALL
    SELECT 'ts_freshness', CAST(stale_rows AS BIGINT), 0, stale_rows = 0 FROM m
    """


@query("q_dq_checks", oracle=_ORACLE)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch data-quality contract over events: 6 expectations from one
    scan; the report carries the exact observed metric beside its bound
    so a failing partition is diagnosable from the report alone."""
    return dq_report(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Distribution drift: population stability index between time windows
# ---------------------------------------------------------------------------


@query(
    "q_drift_psi",
    oracle=f"""
    WITH binned AS (
      SELECT event_type,
             greatest(least(CAST(floor(value / 10) AS BIGINT), 9), 0) AS bin,
             count(*) FILTER (ts <  TIMESTAMP '2024-01-16') AS r,
             count(*) FILTER (ts >= TIMESTAMP '2024-01-16') AS c
      FROM events WHERE value IS NOT NULL AND {FINITE_VALUE_SQL}
      GROUP BY 1, 2),
    spine AS (
      SELECT DISTINCT event_type, u.bin
      FROM binned, unnest(range(0, 10)) AS u(bin)),
    filled AS (
      SELECT s.event_type, s.bin,
             COALESCE(b.r, 0) AS r, COALESCE(b.c, 0) AS c
      FROM spine s LEFT JOIN binned b
        ON s.event_type = b.event_type AND s.bin = b.bin),
    tot AS (
      SELECT event_type, sum(r) AS nr, sum(c) AS nc
      FROM filled GROUP BY 1),
    terms AS (
      SELECT f.event_type,
             CAST(round(
               ((CAST(c + 1 AS DOUBLE) / (nc + 10)) - (CAST(r + 1 AS DOUBLE) / (nr + 10)))
               * ln((CAST(c + 1 AS DOUBLE) * (nr + 10)) / (CAST(r + 1 AS DOUBLE) * (nc + 10)))
               * 1000000.0, 0) AS BIGINT) AS t_micros
      FROM filled f JOIN tot USING (event_type))
    SELECT event_type,
           CAST(sum(t_micros) AS BIGINT) AS psi_micros,
           sum(t_micros) >= 200000 AS drifted
    FROM terms GROUP BY event_type
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the value distribution, first half of
    the month (reference window) vs second half (current window), per
    event_type — the schema-drift / data-drift monitor that pages before
    a model quietly degrades.

    Single-scan design like q_dq_checks: BOTH windows' bin counts come
    from one conditional aggregate over one pass (no second read of the
    fact table — the types×10 spine derives from the already-aggregated
    bin frame, since every type with any row appears there); the bin is
    CLAMPED on both ends (out-of-range values land in the edge bins, so
    a sign-flip or scale bug upstream shifts visible mass instead of
    silently vanishing from both windows) and NULL values are excluded
    explicitly (a NULL bin would otherwise drop rows from counts AND
    totals). Laplace (+1) smoothing keeps every log finite without an
    epsilon branch. Per-bin PSI terms are one fixed IEEE expression over
    exact BIGINT counts rounded to integer micros BEFORE the only
    summation, so the driver hash-compare is exact at any partition
    count. drifted = PSI >= 0.2, the standard alert threshold.
    """
    # NULL excluded explicitly; NaN/Inf gated via finite_values — a NaN
    # would land in bin 0 SILENTLY on the Spark side (floor→long) while
    # DuckDB raises on the cast: the worst divergence class, one engine
    # wrong and the other dead
    e = finite_values(load_table(spark, sf_dir, "events")).where(
        F.col("value").isNotNull()
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    bin_expr = F.greatest(
        F.least(F.floor(F.col("value") / 10).cast("long"), F.lit(9).cast("long")),
        F.lit(0).cast("long"),
    )
    binned = e.groupBy("event_type", bin_expr.alias("bin")).agg(
        F.count(F.when(F.col("ts") < cut, 1)).alias("r"),
        F.count(F.when(F.col("ts") >= cut, 1)).alias("c"),
    )
    spine = (
        binned.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(9)).cast("array<long>")).alias("bin"))
    )
    filled = (
        spine.join(binned, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("r").alias("nr"), F.sum("c").alias("nc")
    )
    f = filled.join(tot, "event_type")
    p = (F.col("r") + 1).cast("double") / (F.col("nr") + 10)
    q = (F.col("c") + 1).cast("double") / (F.col("nc") + 10)
    ratio = ((F.col("c") + 1).cast("double") * (F.col("nr") + 10)) / (
        (F.col("r") + 1).cast("double") * (F.col("nc") + 10)
    )
    term = F.round((q - p) * F.log(ratio) * 1_000_000.0, 0).cast("long")
    return (
        f.select("event_type", term.alias("t_micros"))
        .groupBy("event_type")
        .agg(F.sum("t_micros").cast("long").alias("psi_micros"))
        .select(
            "event_type",
            "psi_micros",
            (F.col("psi_micros") >= 200_000).alias("drifted"),
        )
    )


# ---------------------------------------------------------------------------
# Observed writes: pipeline metrics from the write pass itself
# ---------------------------------------------------------------------------


def observed_write(df: DataFrame, path: str, metrics: dict[str, "F.Column"] | None = None) -> dict:
    """Write ``df`` to parquet while collecting side-channel metrics from
    the SAME pass via the Observation API — no second scan.

    q_dq_checks answers "is this table healthy" with its own aggregate
    job; a pipeline ALSO wants per-write telemetry (rows written, null
    rates, value bounds) without paying a second read of what it just
    computed. ``df.observe`` attaches the aggregates to the write job
    itself — at 100 TB that is a free audit row vs a duplicated scan.

    Returns the observed metric dict. Default metrics: row count.
    Constraint inherited from the Observation API: DISTINCT aggregates are
    rejected — use approx_count_distinct for cardinality telemetry.
    """
    from pyspark.sql import Observation

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    names = list(metrics)
    observed = df.observe(obs, *[metrics[n].alias(n) for n in names])
    observed.write.mode("overwrite").parquet(path)
    return dict(obs.get)
