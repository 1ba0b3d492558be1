"""Histogram operators: equi-width and exact equi-depth.

The reference has no histogram surface (its aggregation layer is the
stream-state rollup, stream/entity.go); these are the OLAP profiling
shapes every warehouse exposes (NUMROWS/HEIGHT-balanced stats, ANALYZE
histograms) and every curation pipeline runs to pick quality thresholds.

Scale notes:

* Equi-width is a map-only bucket projection + one small shuffle (one
  group per bucket) — the cheapest possible distribution sketch.
* Equi-depth needs the cumulative distribution. The naive form is a
  global ``sum() OVER (ORDER BY val)`` window — a SINGLE-partition sort
  at 100 TB, the classic window scale-killer. Implemented instead as a
  partition-parallel prefix sum: value-level pre-aggregate (distinct
  values, not rows) → ``repartitionByRange`` on the value → per-range
  local cumulative sums (window PARTITIONED by the range id, so every
  range runs in parallel) → a prefix sum over the P per-range totals (P
  = partition count, metadata-scale) broadcast-joined back. No global
  single-partition window ever materializes; tests/test_plans.py pins
  that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import attach_scalar, load_table

# Fixed a-priori bounds for the equi-width form (TPC-H extended price is
# ~[900, 105000] at every SF — bounds are part of the histogram spec, not
# derived from the data, so the operator stays one-pass).
_EW_LO = 900.0
_EW_HI = 105000.0
_EW_BUCKETS = 16
_EW_WIDTH = (_EW_HI - _EW_LO) / _EW_BUCKETS

_ED_BUCKETS = 8


@query(
    "q_hist_equiwidth",
    oracle=f"""
    WITH b AS (
      SELECT CAST(least(greatest(floor((l_extendedprice - {_EW_LO}) / {_EW_WIDTH}), 0),
                        {_EW_BUCKETS - 1}) AS INT) AS bucket,
             l_extendedprice AS val
      FROM lineitem)
    SELECT bucket,
           round(CAST({_EW_LO} + bucket * {_EW_WIDTH} AS DOUBLE), 2) AS bucket_lo,
           round(CAST({_EW_LO} + (bucket + 1) * {_EW_WIDTH} AS DOUBLE), 2) AS bucket_hi,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(val * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM b GROUP BY bucket
    """,
)
def q_hist_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of lineitem extended price: fixed [900, 105000]
    domain, 16 buckets, out-of-range clamped to the edge buckets.

    Map-only bucket projection, then a 16-group hash aggregate — partial
    (map-side) combine collapses each scan task to ≤16 rows before the
    shuffle, so the shuffle is O(tasks × buckets) regardless of data size.
    Sums are exact integer cents (order-independent), mirroring the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr(
            f"CAST(least(greatest(floor((l_extendedprice - {_EW_LO}) / {_EW_WIDTH}), 0),"
            f" {_EW_BUCKETS - 1}) AS INT)"
        ).alias("bucket"),
        F.col("l_extendedprice").alias("val"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.round(F.col("val") * 100, 0).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .select(
            "bucket",
            F.round(F.lit(_EW_LO) + F.col("bucket") * F.lit(_EW_WIDTH), 2).alias(
                "bucket_lo"
            ),
            F.round(F.lit(_EW_LO) + (F.col("bucket") + 1) * F.lit(_EW_WIDTH), 2).alias(
                "bucket_hi"
            ),
            "n_rows",
            "sum_cents",
        )
    )


def parallel_prefix_sum(vc: DataFrame, val: str, cnt: str, num_ranges: int) -> DataFrame:
    """Add a ``cum_before`` column (sum of ``cnt`` over all rows with a
    strictly smaller ``val``) without a single-partition global window.

    Range-partition by value → per-range local prefix sums (window keyed by
    the range id, parallel across ranges) → prefix-sum the P per-range
    totals (metadata-scale) and broadcast the offsets back.
    Requires distinct ``val`` rows (a value-level pre-aggregate).
    """
    ranged = vc.repartitionByRange(num_ranges, F.col(val)).withColumn(
        "_rid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_rid")
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local_before", F.coalesce(F.sum(cnt).over(local_w), F.lit(0))
    )
    totals = ranged.groupBy("_rid").agg(F.sum(cnt).alias("_range_total"))
    offs_w = (
        Window.orderBy("_rid").rowsBetween(Window.unboundedPreceding, -1)
    )  # P rows only — single partition over metadata, not data
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_range_total").over(offs_w), F.lit(0))
    ).select("_rid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_rid")
        .withColumn("cum_before", F.col("_local_before") + F.col("_offset"))
        .drop("_rid", "_local_before", "_offset")
    )


@query(
    "q_hist_equidepth",
    oracle=f"""
    WITH vc AS (
      SELECT l_extendedprice AS val, count(*) AS cnt
      FROM lineitem GROUP BY 1),
    c AS (
      SELECT val, cnt,
             COALESCE(sum(cnt) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
             (SELECT sum(cnt) FROM vc) AS n_total
      FROM vc)
    SELECT CAST((cum_before * {_ED_BUCKETS}) // n_total AS INT) AS bucket,
           round(min(val), 2) AS lo,
           round(max(val), 2) AS hi,
           CAST(sum(cnt) AS BIGINT) AS n_rows
    FROM c GROUP BY 1
    """,
)
def q_hist_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (height-balanced) histogram of extended price:
    8 buckets of ~equal row count, whole value-groups never split.

    bucket(v) = floor(cum_before(v) * k / n) — pure integer arithmetic on
    exact cumulative counts, so Spark and the oracle agree bit-for-bit.
    The CDF comes from :func:`parallel_prefix_sum` (see module docstring);
    the oracle uses the naive global window, which is fine single-node.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Materialize the value-level aggregate once: three downstream branches
    # (local cumsums, per-range totals, grand total) would otherwise each
    # re-scan the base table. On a cluster use checkpoint()/cache() instead.
    vc = (
        li.groupBy(F.col("l_extendedprice").alias("val"))
        .agg(F.count("*").alias("cnt"))
        # lazy: the caller's single action materializes it once and all
        # three branches read the persisted RDD — no separate eager job
        .localCheckpoint(eager=False)
    )
    c = parallel_prefix_sum(vc, "val", "cnt", num_ranges=16)
    n_total = vc.agg(F.sum("cnt").alias("n_total"))
    return (
        attach_scalar(c, n_total, "n_total")
        .select(
            F.expr(f"CAST((cum_before * {_ED_BUCKETS}) DIV n_total AS INT)").alias(
                "bucket"
            ),
            "val",
            "cnt",
        )
        .groupBy("bucket")
        .agg(
            F.round(F.min("val"), 2).alias("lo"),
            F.round(F.max("val"), 2).alias("hi"),
            F.sum("cnt").cast("long").alias("n_rows"),
        )
    )
