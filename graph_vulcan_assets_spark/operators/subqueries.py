"""Correlated-subquery TPC-H shapes (Q2/Q4/Q13/Q15/Q17/Q20/Q21/Q22),
adapted to the trimmed testdata schema (no partsupp, no commit/receipt
dates — see TESTDATA.md).

The reference has no subquery surface at all (its reads are id-keyed
lookups, inventory/inventory.go:497-628); these shapes complete the SQL
surface a warehouse user expects and — more importantly at 100 TB —
exercise Catalyst's *decorrelation*: every correlated scalar / EXISTS /
NOT EXISTS / IN subquery below must rewrite into a join (aggregate +
equi-join for scalars, left-semi for EXISTS/IN, left-anti for NOT
EXISTS), never a per-row re-execution and never a CartesianProduct.
``tests/test_plans.py`` pins that for each shape.

Each query is ONE SQL string that parses identically in Spark SQL and
DuckDB, so the oracle is literally the same text — any result mismatch
is an engine-semantics difference, not a transcription bug. Exactness
rules (driver hash compares values bit-for-bit):

* money sums go through integer cents/micros (`CAST(round(x*100,0) AS
  BIGINT)`) so summation order is irrelevant;
* `l_quantity` is integral-valued double (1..50), so `sum`/`avg` are
  exact in IEEE double regardless of order — Q17's `0.2 * avg`
  comparison is therefore deterministic on both engines;
* counts are BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import register_views

# name -> (docstring summary, SQL that runs verbatim on Spark SQL and DuckDB)
SHAPES: dict[str, tuple[str, str]] = {
    # Q2: min-cost supplier per part. partsupp does not exist in the
    # testdata; the observed part-supplier relation is distilled from
    # lineitem. The correlated scalar MIN must decorrelate into a
    # per-part aggregate joined back (not re-run per outer row).
    "q_shape_q2": (
        "min-acctbal supplier per STANDARD small part (correlated scalar MIN)",
        """
        WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
                                    l_suppkey AS ps_suppkey FROM lineitem)
        SELECT p_partkey, p_name, s_name, s_acctbal
        FROM part
        JOIN ps ON ps_partkey = p_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        WHERE p_size <= 10 AND p_type = 'STANDARD'
          AND s_acctbal = (SELECT min(s2.s_acctbal)
                           FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                           WHERE ps2.ps_partkey = p_partkey)
        """,
    ),
    # Q4: order-priority checking. The reference schema lacks
    # l_commitdate/l_receiptdate; "late" is adapted to shipped-after-order
    # date. EXISTS with an outer-referencing inequality must become ONE
    # left-semi join (equi on l_orderkey, residual on the date).
    "q_shape_q4": (
        "order priority distribution over orders with a late-shipped item (EXISTS)",
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """,
    ),
    # Q13: customer order-count distribution — the canonical
    # outer-join-preserving group-by (customers with zero orders must
    # survive into the c_count=0 bucket).
    "q_shape_q13": (
        "customer distribution by order count incl. zero (outer join + double group-by)",
        """
        WITH c_orders AS (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM c_orders GROUP BY c_count
        """,
    ),
    # Q15: top supplier by quarterly revenue — uncorrelated scalar MAX
    # over a CTE used twice; revenue in exact integer micros.
    "q_shape_q15": (
        "supplier(s) with max quarterly revenue (scalar subquery over CTE)",
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                          AS BIGINT)) AS total_micros
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               CAST(total_micros AS DOUBLE) / 1000000.0 AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_micros = (SELECT max(total_micros) FROM revenue)
        """,
    ),
    # Q17: small-quantity-order revenue. The correlated AVG must
    # decorrelate to a per-part aggregate + equi-join. l_quantity is
    # integral double so avg is bit-exact; the output sum is exact cents.
    "q_shape_q17": (
        "revenue from below-avg-quantity lineitems of one brand (correlated AVG)",
        """
        SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 700.0, 4)
                 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                                  WHERE l2.l_partkey = p_partkey)
        """,
    ),
    # Q20: nested IN over a grouped HAVING subquery — must become a
    # left-semi join on s_suppkey, with the aggregate evaluated once.
    "q_shape_q20": (
        "suppliers that shipped >100 units of any 'small %' part in 1998+ (IN + HAVING)",
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 100)
        """,
    ),
    # Q21: suppliers who shipped the LAST item of multi-supplier 'F'
    # orders (adaptation of waiting-supplier; no receipt/commit dates).
    # EXISTS -> semi join, NOT EXISTS with outer inequality -> anti join;
    # both on the l_orderkey equi key.
    "q_shape_q21": (
        "last-shipping supplier in multi-supplier F orders (EXISTS + NOT EXISTS)",
        """
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        """,
    ),
    # Q22: rich customers with no URGENT orders ("no orders at all" is
    # vacuous in this testdata — every customer has one; de-vacuation per
    # the round-1 lesson). Exact integer comparison (cents * count >
    # sum_cents) instead of a float AVG threshold, so the boundary is
    # deterministic; NOT EXISTS -> left-anti join.
    "q_shape_q22": (
        "above-avg-balance customers with no urgent orders, by nation (anti join + scalar avg)",
        """
        WITH avg_bal AS (
          SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS sum_cents,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM customer WHERE c_acctbal > 0.0)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
        FROM customer
        WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * (SELECT cnt FROM avg_bal)
                > (SELECT sum_cents FROM avg_bal)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        """,
    ),
}


def _make(name: str, summary: str, sql: str):
    @query(name, oracle=sql)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    run.__name__ = name
    run.__doc__ = (
        f"{summary}.\n\n"
        "Same SQL text as the DuckDB oracle; see module docstring for the "
        "decorrelation and exactness contract."
    )
    return run


for _name, (_summary, _sql) in SHAPES.items():
    globals()[_name] = _make(_name, _summary, _sql)
