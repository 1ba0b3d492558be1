"""Composite analytical queries (TPC-H shapes adapted to the testdata
schema) — multi-operator pipelines the relational inventory composes into.

These exercise filter → multi-join → aggregate → top-k end-to-end, the
shape that dominates real warehouse workloads. Revenue sums use the exact
integer micro-unit form (see aggregates.q_agg_groupby) so the ORDER BY
revenue ranking is bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table


def _revenue_micros() -> F.Column:
    return (
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000, 0).cast("long")
        )
        / 1000000.0
    )


@query(
    "q_shape_q3",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q_shape_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape (TPC-H Q3): segment filter → 3-way join →
    per-order revenue → top 10."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1996-07-01")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1996-07-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_revenue_micros().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_join_part_supplier",
    oracle="""
    SELECT p_brand, s_nationkey,
           sum(CAST(round(l_quantity * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_qty,
           sum(CAST(round(p_retailprice * 1000000, 0) AS BIGINT)) / 1000000.0
             / count(*) AS avg_retail,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_type IN ('ECONOMY', 'PROMO')
    GROUP BY p_brand, s_nationkey
    """,
)
def q_join_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/supplier dimension joins (completes table coverage): lineitem
    resolved against both dimensions, grouped by brand × supplier nation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_type").isin("ECONOMY", "PROMO")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_nationkey")
        .agg(
            (F.sum(F.round(F.col("l_quantity") * 1000000, 0).cast("long")) / 1000000.0).alias("sum_qty"),
            # exact-sum / count: bit-identical in both engines — avg() of
            # 2-decimal prices lands exactly on round-half boundaries
            (
                F.sum(F.round(F.col("p_retailprice") * 1000000, 0).cast("long"))
                / 1000000.0
                / F.count("*")
            ).alias("avg_retail"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_shape_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_shape_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting shape (TPC-H Q10): returned lineitems →
    customer/nation rollup → top 20 by lost revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue_micros().alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_shape_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q_shape_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer shape (TPC-H Q18): grouped-HAVING subquery →
    semi-join → 3-way join → re-aggregate → top 100.

    The IN-subquery is expressed as an aggregate + left-semi join: the
    big-orders key set is aggregated FIRST (partial aggregation map-side),
    so the expensive customer⋈orders⋈lineitem join only sees qualifying
    orders. l_quantity is integral, so the double sums are exact and
    order-independent — the ORDER BY ranking is bit-identical in both
    engines without micro-unit tricks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )
