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
    "q_shape_q5",
    oracle="""
    SELECT n_name,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_shape_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume shape (TPC-H Q5): 6-way join where the
    supplier must share the customer's nation (the extra non-key equality
    rides the supplier join), region-filtered through two broadcast dims.

    Join order matters at scale: orders is date-filtered FIRST, so the
    big lineitem⋈orders shuffle only carries one year of orders; nation
    and region broadcast; the n_regionkey filter prunes supplier rows
    before the revenue aggregation.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue_micros().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q_shape_q6",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice * l_discount * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24 AS DOUBLE)
    """,
)
def q_shape_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change shape (TPC-H Q6): pure scan + conjunctive
    range predicates + single global aggregate — the fully-pushed-down
    query. All three predicates reach the parquet scan (PushedFilters),
    so at 100 TB this reads only row groups whose min/max bands overlap
    one shipdate year; no shuffle at all before the final 1-row reduce.
    Discount bounds are CAST AS DOUBLE on the oracle side so DuckDB
    compares double-to-double exactly as Spark does, not via DECIMAL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (
            F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 1000000, 0).cast("long"))
            / 1000000.0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q_shape_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS revenue
    FROM supplier
    JOIN lineitem  ON s_suppkey = l_suppkey
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_shape_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-shipping shape (TPC-H Q7): bidirectional nation-pair trade —
    two broadcast joins against the same dimension under different roles,
    a disjunctive cross-dimension predicate, per-year rollup.

    The OR predicate correlates the two nation dims, so it can't push
    into either join; it runs as a post-join filter over broadcast-joined
    rows — cheap, because both nation sides are broadcast and the filter
    cuts fact rows before the shuffle to the aggregate.
    """
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    n1 = nt.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nt.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_revenue_micros().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_shape_q8",
    oracle="""
    WITH all_nations AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                  AS BIGINT) AS volume_micros,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem  ON p_partkey = l_partkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume_micros ELSE 0 END) AS DOUBLE)
                 / sum(volume_micros), 6) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_shape_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National-market-share shape (TPC-H Q8): conditional share-of-total —
    8-way join, customer-side region gate, supplier-side nation tagged for
    the CASE numerator, per-year ratio of two exact integer sums.

    The ratio divides two exact BIGINT micro-sums as doubles (IEEE
    division is bit-identical across engines), then rounds to 6 places.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    n1 = nt.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nt.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000, 0).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume_micros", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume_micros")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("volume_micros"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_shape_q14",
    oracle="""
    SELECT round(100.0
             * CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                              AS BIGINT) ELSE 0 END) AS DOUBLE)
             / sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                        AS BIGINT)), 6) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_shape_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect shape (TPC-H Q14): one month of lineitems joined to
    the part dim (broadcast), CASE-conditional revenue share as a
    percentage — exact integer micro-sums divided as doubles.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000, 0).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("volume_micros", vol)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("volume_micros")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("volume_micros"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q_shape_q19",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= CAST(1 AS DOUBLE) AND l_quantity <= CAST(11 AS DOUBLE))
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= CAST(10 AS DOUBLE) AND l_quantity <= CAST(20 AS DOUBLE))
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= CAST(20 AS DOUBLE) AND l_quantity <= CAST(30 AS DOUBLE))
    """,
)
def q_shape_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue shape (TPC-H Q19): disjunction of conjunctive
    band predicates spanning BOTH join sides (part attrs AND lineitem
    attrs in each arm) — the classic OR-of-ANDs join filter.

    Catalyst extracts the common single-side factors from the
    disjunction: the part side is pre-filtered to the three brands and
    the union of size bands, and lineitem to the union of quantity bands
    (CNF conversion), BEFORE the join; the full disjunction re-applies
    post-join. At 100 TB that pre-filter is the difference between
    joining 3 brands' parts and joining every part.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    return j.where(arm1 | arm2 | arm3).agg(
        (
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000, 0).cast(
                    "long"
                )
            )
            / 1000000.0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
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
