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
from graph_vulcan_assets_spark.tables import FINITE_VALUE_SQL, finite_values, load_table, micros128


def salted_count_sum(
    df: DataFrame, key: str, value: str, salt_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) → groupBy(key).

    Phase 1 spreads each hot key over `salt_buckets` reducers; phase 2
    combines `salt_buckets` partial rows per key — bounded work per
    reducer regardless of key skew. Decomposable aggregates only
    (count/sum/min/max); the result is identical to a direct groupBy.

    ``salt_col`` must be a DETERMINISTIC high-cardinality column (a row
    id, an event id). A nondeterministic salt such as
    ``monotonically_increasing_id`` is a correctness bug as a shuffle
    grouping key: a partial map-stage retry recomputes rows with
    DIFFERENT salts than the copies already fetched, double-counting or
    dropping them — which is why the parameter is required, not
    defaulted.
    """
    salt = F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets))
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
    oracle=f"""
    SELECT event_type, count(*) AS n,
           sum(CAST(round(value * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_value
    FROM events WHERE {FINITE_VALUE_SQL} GROUP BY event_type
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation on a genuinely skewed key (5 event types over
    the whole table — every key is hot).

    Result is identical to the direct groupBy (the oracle); the plan
    differs: two exchanges, each with bounded per-reducer input. The value
    sum uses the exact integer micro-unit form so the two-phase combine is
    order-independent. NaN/Inf samples are gated out (finite_values,
    mirrored in the oracle) before the micros cast.
    """
    e = finite_values(load_table(spark, sf_dir, "events")).withColumn(
        # 128-bit accumulator (tables.micros128): the hot-key group sums
        # most of the table, the first place a BIGINT micros sum overflows
        "value_micros", micros128("value")
    )
    agg = salted_count_sum(e, "event_type", "value_micros", salt_col="event_id")
    return agg.select(
        "event_type",
        F.col("n"),
        (F.col("s") / 1000000.0).alias("sum_value"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_salt_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join for when BOTH sides are too big to broadcast.

    The fact side gets a deterministic salt (hash of ``fact_salt_col``, a
    high-cardinality column — REQUIRED: salting by the join key itself
    gives every row of a hot key the identical salt, leaving the hot key
    on one reducer while still paying the dim explosion); the dim side is
    exploded ``salt_buckets``× so every (key, salt) bucket finds its dim
    row. The join key becomes (key, salt), so a hot key's rows spread
    over ``salt_buckets`` reducers instead of one. Result is
    row-identical to ``fact.join(dim, key)``; cost is the dim-side
    blowup — use only when the dim is modest (≪ fact / salt_buckets) yet
    above the broadcast threshold. AQE's skew-join split is the first
    line of defense (enabled in session.py); this is the logical-plan fix
    for when AQE can't help, e.g. a skewed key feeding a downstream
    bucketed write.
    """
    if fact_salt_col == key:
        raise ValueError(
            "fact_salt_col must differ from the join key — salting by the "
            "key gives a hot key one salt value, defeating the spread"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(fact_salt_col), F.lit(salt_buckets))
    )
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    return (
        salted_fact.hint("merge")
        .join(exploded_dim, [key, "__salt"])
        .drop("__salt")
    )


@query(
    "q_join_salted",
    oracle="""
    WITH dim AS (SELECT DISTINCT event_type,
                        event_type IN ('purchase', 'signup') AS is_conversion
                 FROM events)
    SELECT is_conversion, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events JOIN dim USING (event_type)
    GROUP BY is_conversion
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on the maximally skewed key (5 event types over the
    whole fact table). Every fact row carries a salt from its unique
    event_id, the 5-row dim is exploded 16×, and the shuffle join runs on
    (event_type, __salt) — 80 balanced buckets instead of 5 hot ones.
    Row-identical to the plain join (the oracle); the merge hint keeps
    the demonstration honest by blocking the broadcast fast path a 5-row
    dim would otherwise take.
    """
    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("is_conversion", F.col("event_type").isin("purchase", "signup"))
    )
    joined = salted_join(e, dim, "event_type", fact_salt_col="event_id")
    return joined.groupBy("is_conversion").agg(
        F.count("*").cast("long").alias("n"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )
