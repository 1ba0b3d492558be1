"""Sorts / limits / top-k (§2.6) and set operations (§2.7).

Reference cites: golden tests sort result sets by natural keys for
order-insensitive comparison (cmd/graph-vulcan-assets/main_test.go:374-392);
cascade expiry processes parents ∪ children with identical logic
(cmd/graph-vulcan-assets/main.go:331-361).

Scale notes: sort+limit compiles to TakeOrderedAndProject (per-partition
top-k then a k-row merge on the driver) — no global sort materializes.
Set ops are union (no shuffle) plus distinct (one shuffle) where required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table


@query(
    "q_sort_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate, l_quantity
    FROM lineitem
    ORDER BY l_returnflag ASC, l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key deterministic sort (O1) with limit.

    The tiebreak columns (l_orderkey, l_linenumber) make the limited prefix
    unique, so both engines pick the same 100 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_quantity")
        .limit(100)
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K (O3): TakeOrderedAndProject, K rows per partition max."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(50)
    )


@query(
    "q_union_all",
    oracle="""
    SELECT event_id, user_id, 'click' AS src FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, 'view' AS src FROM events WHERE event_type = 'view'
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (U1): the parents ∪ children edge-direction union.

    Reference: cmd/graph-vulcan-assets/main.go:331-361 — both directions
    processed with identical logic. unionByName is a zero-shuffle concat.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("click").alias("src")
    )
    views = e.where(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("view").alias("src")
    )
    return clicks.unionByName(views)


@query(
    "q_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (U2): concat + one hash-distinct shuffle."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select("user_id")
    b = e.where(F.col("event_type") == "view").select("user_id")
    return a.unionByName(b).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (U2): users who both clicked and purchased."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select("user_id")
    b = e.where(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT user_id, event_type FROM events
    EXCEPT
    SELECT user_id, event_type FROM events WHERE event_type = 'error'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (U2): (user, event_type) pairs minus the error pairs.

    The difference runs on the composite projection — at the testdata's
    density every user has every event type, so a user-id-only EXCEPT
    would be vacuously empty (0 rows proves nothing); the pair-level
    difference keeps all non-error combinations.
    """
    e = load_table(spark, sf_dir, "events")
    a = e.select("user_id", "event_type")
    b = e.where(F.col("event_type") == "error").select("user_id", "event_type")
    return a.subtract(b)


@query(
    "q_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type IN ('click', 'view')
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (U2): multiset difference (keeps multiplicities)."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("event_type").isin("click", "view")).select("user_id")
    b = e.where(F.col("event_type") == "view").select("user_id")
    return a.exceptAll(b)


@query(
    "q_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (U2): multiset intersection."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select("user_id")
    b = e.where(F.col("event_type") == "purchase").select("user_id")
    return a.intersectAll(b)
