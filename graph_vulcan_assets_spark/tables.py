"""Table loaders for the driver-generated synthetic tables (TESTDATA.md).

All reads are plain ``spark.read.parquet`` so Catalyst predicate pushdown,
column pruning and partition pruning apply automatically downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Pin the session timezone at first table load: epoch-based event-time
    # arithmetic (unix_micros, epoch-aligned windows) and the NTZ→LTZ cast
    # below assume UTC, but the driver may hand us a vanilla SparkSession
    # whose tz follows the host JVM. Runtime-settable, idempotent.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as either TIMESTAMP(NANOS) parquet (which
        # Spark's reader rejects without the legacy long fallback) or plain
        # TIMESTAMP(MICROS), depending on the generator version. Handle both:
        # when the nanos fallback kicks in, ts reads as a long and we truncate
        # to microseconds — the same truncation DuckDB applies, so oracle
        # comparisons stay exact; when it's already a timestamp, pass through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes)["ts"] in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        else:
            # TIMESTAMP(MICROS) parquet reads as TIMESTAMP_NTZ; normalize to
            # TimestampType (LTZ) — streaming event-time/watermarks require
            # it, and it reproduces the nanos-era semantics exactly (session
            # timezone is UTC, so the wall clock IS the epoch instant).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Corrupt-measure gate (round-5 hostile-input sweep, full-materialization
# pass): every query that quantizes events.value into exact integer units
# (milli/micro casts — the trick that makes float aggregates
# summation-order-independent and driver-hashable) dies on a NaN/±Inf
# sample with ANSI CAST_OVERFLOW, and ±Inf would poison its group's sum
# even where the cast survived. One corrupt sensor reading in a trillion-row
# events table must not kill (or skew) the whole rollup. NULL values PASS
# the gate — both engines' aggregates skip NULLs identically, and a NULL
# measure row still counts toward count(*) semantics.
#
# The bound is the QUANTIZABLE domain, not mere finiteness: a finite but
# absurd magnitude (1e308 from corrupt bits) overflows value*1e6 to Inf
# before the BIGINT cast, killing both engines exactly like NaN does.
# |value| < 9.2e12 keeps integer MICROS inside BIGINT (9.22e18) with
# headroom; any real measure (prices, gauges, rates) sits many orders of
# magnitude below it, so the bound never bites legitimate data.
# ---------------------------------------------------------------------------

VALUE_BOUND = 9.2e12
_VALUE_BOUND = VALUE_BOUND  # back-compat alias

FINITE_VALUE_SQL = (
    f"(value IS NULL OR (isfinite(value) AND abs(value) < {VALUE_BOUND}))"
)


def quantizable(col) -> "F.Column":
    """The single source of truth for "this measure survives integer-micros
    quantization": not NaN and |x| < VALUE_BOUND (which excludes ±Inf for
    free). Every Spark-side gate composes THIS predicate — a third
    hand-rolled copy is how one engine drifts from the other."""
    c = F.col(col) if isinstance(col, str) else col
    return ~F.isnan(c) & (F.abs(c) < F.lit(VALUE_BOUND))


def finite_values(df: DataFrame, col: str = "value") -> DataFrame:
    """Drop rows whose measure column is NaN/±Inf or beyond the integer-
    micros quantizable range; keep NULLs. DuckDB oracle mirror:
    :data:`FINITE_VALUE_SQL` — applied to BOTH sides so Spark and the
    oracle agree on dirty data by construction."""
    c = F.col(col)
    return df.where(c.isNull() | quantizable(c))


# ---------------------------------------------------------------------------
# Plausible event-time domain (round 6 — the VALUE_BOUND/EMBED_BOUND
# insight applied to timestamps): corrupt bits decode to "valid" ancient
# or far-future timestamps as readily as to NaN. Outside [1900, 2200),
# three failure classes, each reproduced by the extreme-ts probe:
#   1. the parquet Julian↔proleptic-Gregorian rebase shifts ancient dates
#      by days, so the engines do not even agree what instant the cell IS
#      — 0001-01-01 reads back in year 0, which Python's datetime cannot
#      represent, so the driver's collect() dies on ANY query that emits
#      or window-aligns the row;
#   2. per-interval spine generators (timeseries gapfill/interpolate)
#      size themselves by max(ts)−min(ts): one year-9999 row turns a
#      one-day spine into hundreds of millions of rows — a hang;
#   3. watermark/interval arithmetic near the timestamp domain edges
#      overflows in streaming state handling.
# Any real event time sits centuries inside the bounds, so the gate never
# bites legitimate data. NULL passes — NULL event-time handling stays a
# per-query semantic (windows drop it, scans keep it), exactly like the
# NULL rule in finite_values.
# ---------------------------------------------------------------------------

TS_LO = "1900-01-01"
TS_HI = "2200-01-01"


def plausible_ts_sql(col: str = "ts") -> str:
    """DuckDB mirror of :func:`plausible_ts` (interpolate, never copy)."""
    return (
        f"({col} IS NULL OR ({col} >= TIMESTAMP '{TS_LO}'"
        f" AND {col} < TIMESTAMP '{TS_HI}'))"
    )


def plausible_ts(col="ts") -> "F.Column":
    """True when the event time is NULL or inside the plausible domain.
    The comparison itself is safe on both engines even where the exact
    ancient instant diverges by the calendar rebase — both readings sit
    centuries below TS_LO, so the row classifies identically."""
    c = F.col(col) if isinstance(col, str) else col
    lo = F.lit(TS_LO).cast("timestamp")
    hi = F.lit(TS_HI).cast("timestamp")
    return c.isNull() | ((c >= lo) & (c < hi))


def plausible_times(df: DataFrame, col: str = "ts") -> DataFrame:
    """Drop rows whose event time is outside [TS_LO, TS_HI); keep NULLs.
    DuckDB oracle mirror: :func:`plausible_ts_sql`."""
    return df.where(plausible_ts(col))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-flavored queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
