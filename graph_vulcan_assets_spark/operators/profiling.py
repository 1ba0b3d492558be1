"""Data-profiling operator: one-pass per-column statistics.

The shape every warehouse/curation pipeline runs before trusting a new
table: null fractions, ranges, cardinalities, means — computed for all
profiled columns in ONE scan (unpivot → groupBy column name) instead of
N per-column passes. At 100 TB the difference between one scan and N
scans IS the feature.

The reference has no profiling surface (it trusts its fixed REST models,
inventory/inventory.go:45-113); this generalizes the engine's
introspection the way ANALYZE TABLE does for CBO stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "q_profile_columns",
    oracle="""
    WITH u AS (
      SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS val FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem)
    SELECT col_name,
           count(*) AS n_rows,
           count(val) AS n_nonnull,
           count(DISTINCT val) AS n_distinct,
           round(min(val), 6) AS min_val,
           round(max(val), 6) AS max_val,
           round(sum(CAST(round(val * 1000000, 0) AS BIGINT))
                 / 1000000.0 / count(val), 6) AS avg_val
    FROM u GROUP BY col_name
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of lineitem numerics in a single scan.

    ``stack`` unpivots the profiled columns to (col_name, val) rows inside
    the scan's project — one pass over the table, one shuffle keyed by
    col_name (4 groups). The mean uses exact micro-unit integer sums so it
    is summation-order independent; min/max/count are order-independent by
    nature. Exact distinct counts are required for oracle parity — the
    scale variant swaps in approx_count_distinct (A6, rows-only).
    """
    li = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS DOUBLE)" for c in _PROFILE_COLS
    )
    u = li.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col_name, val)")
    )
    return u.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.countDistinct("val").alias("n_distinct"),
        F.round(F.min("val"), 6).alias("min_val"),
        F.round(F.max("val"), 6).alias("max_val"),
        F.round(
            F.sum(F.round(F.col("val") * 1000000, 0).cast("long"))
            / 1000000.0
            / F.count("val"),
            6,
        ).alias("avg_val"),
    )
