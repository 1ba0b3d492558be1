"""Skew-mitigation operators.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session.py), but two patterns are worth expressing explicitly
because they change the *logical* plan:

- two-phase salted aggregation: for power-law keys, aggregate on
  (key, salt) first so no single reducer receives a hot key's full row
  set, then combine the partials;
- salted broadcast-fallback join would follow the same shape (salt the
  hot side, explode the other); the engine's dimension joins broadcast
  instead, which is the stronger fix when one side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table


def salted_count_sum(
    df: DataFrame, key: str, value: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) → groupBy(key).

    Phase 1 spreads each hot key over `salt_buckets` reducers; phase 2
    combines `salt_buckets` partial rows per key — bounded work per
    reducer regardless of key skew. Decomposable aggregates only
    (count/sum/min/max); the result is identical to a direct groupBy.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__n"), F.sum(value).alias("__s"))
    )
    return partial.groupBy(key).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("s")
    )


@query(
    "q_agg_salted",
    oracle="""
    SELECT event_type, count(*) AS n,
           sum(CAST(round(value * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation on a genuinely skewed key (5 event types over
    the whole table — every key is hot).

    Result is identical to the direct groupBy (the oracle); the plan
    differs: two exchanges, each with bounded per-reducer input. The value
    sum uses the exact integer micro-unit form so the two-phase combine is
    order-independent.
    """
    e = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16))
    micros = F.round(F.col("value") * 1000000, 0).cast("long")
    partial = (
        e.withColumn("__salt", salt)
        .groupBy("event_type", "__salt")
        .agg(F.count("*").alias("__n"), F.sum(micros).alias("__s"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("__n").alias("n"),
        (F.sum("__s") / 1000000.0).alias("sum_value"),
    )
