"""Sources / scans (SURVEY.md §2.1).

The reference reads messages from Kafka and JSON fixture files
(reference: stream/kafka/kafka.go:64-106, stream/streamtest/streamtest.go:14-60)
and pages results out of its REST inventory
(reference: inventory/inventory.go:115-120,149-163).

Spark-first mapping: parquet scans with Catalyst column pruning and
predicate pushdown; pagination is ORDER BY + LIMIT/OFFSET.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table, plausible_times, plausible_ts_sql


@query(
    "q_scan_events",
    oracle=f"SELECT event_id, ts, user_id, event_type, value, props"
    f" FROM events WHERE {plausible_ts_sql()}",
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the event stream table (S3: fixture source replay).

    Reference parses a JSON fixture into messages one by one
    (stream/streamtest/streamtest.go:14-60); here it is a single columnar
    parquet scan — at 100 TB this is the vectorized Parquet reader with
    nothing else in the plan. Gated to the plausible event-time domain
    (tables.plausible_times): the scan EMITS ts, and an ancient corrupt
    timestamp crosses the parquet calendar rebase into year 0, which the
    collecting driver cannot even represent.
    """
    return plausible_times(load_table(spark, sf_dir, "events")).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "q_scan_pruned",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan (S5): only 2 of 11 lineitem columns leave the reader.

    `.explain` shows ReadSchema with exactly these two fields — at 100 TB the
    other 9 columns are never read off disk (Parquet is columnar).
    """
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (S7): page=2, size=20 over a deterministic total order.

    Reference: inventory/inventory.go:115-120,149-163 (`page`/`size` params).
    Spark ≥3.4 has DataFrame.offset; the sort+limit compiles to
    TakeOrderedAndProject (no full sort materialization).
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(40)
        .limit(20)
    )


@query(
    "q_keyset_page",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey > 2500
    ORDER BY o_orderkey LIMIT 20
    """,
)
def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination (S7 completion): the page AFTER cursor
    o_orderkey=2500.

    OFFSET pagination re-scans and discards every earlier page (the
    reference's page/size API, inventory.go:149-163, and q_limit_offset);
    the keyset form pushes the cursor down as a range filter —
    PushedFilters: [GreaterThan(o_orderkey,2500)] reaches the parquet
    reader and row groups below the cursor are never read — then takes
    top-k. Page 10,000 costs the same as page 1; plan-guarded in
    tests/test_plans.py.
    """
    from graph_vulcan_assets_spark.plans.api import keyset_page

    return keyset_page(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        ["o_orderkey"],
        after=(2500,),
        size=20,
    )
