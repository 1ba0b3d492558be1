"""Aggregations (SURVEY.md §2.4).

Re-expresses the reference's duplicate detection
(cmd/graph-vulcan-assets/main.go:151-166), any-active-owner existence check
(main.go:305-323) and min-preserve start_time logic (main.go:199-218) as
hash aggregates, plus the standard grouped-aggregation families.

Scale notes: every groupBy here compiles to HashAggregate with a partial
(map-side) phase before the shuffle, so the shuffle carries one row per
group per task, not per input row. Double-typed aggregates are rounded
identically in the oracle SQL to absorb summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import (
    FINITE_VALUE_SQL,
    finite_values,
    load_table,
    micros128,
    plausible_times,
    plausible_ts_sql,
)


@query(
    "q_dup_detect",
    oracle="""
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY user_id, event_type HAVING count(*) > 1
    """,
)
def q_dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate detection (A1): natural keys appearing more than once.

    Reference treats >1 row per (type, identifier) as a hard error
    ("duplicated asset", cmd/graph-vulcan-assets/main.go:151-166).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )


@query(
    "q_agg_any_active",
    oracle="""
    SELECT user_id, bool_or(value > 100) AS any_active, count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def q_agg_any_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence aggregate (A2): "is any relation still active?".

    Reference scans owners to see whether any other `owns` edge is active
    before expiring an asset (cmd/graph-vulcan-assets/main.go:305-323) —
    a boolean `any()` aggregate over the group.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.expr("any(value > 100)").alias("any_active"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_minmax",
    oracle=f"""
    SELECT user_id, event_type,
           min(ts) AS start_time, max(ts) AS last_seen,
           round(min(value), 2) AS min_value, round(max(value), 2) AS max_value,
           count(*) AS n
    FROM events WHERE {plausible_ts_sql()} GROUP BY user_id, event_type
    """,
)
def q_agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-preserve / max-advance (A3).

    Reference keeps the original `start_time` on owns-upsert
    (cmd/graph-vulcan-assets/main.go:199-218) and advances `last_seen` on
    each update (inventory/inventory_test.go:407-415) — i.e. min/max per key.
    """
    e = plausible_times(load_table(spark, sf_dir, "events"))
    return e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("start_time"),
        F.max("ts").alias("last_seen"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(round(l_quantity * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_qty,
           sum(CAST(round(l_extendedprice * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_base_price,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS sum_disc_price,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS sum_charge,
           sum(CAST(round(l_quantity * 1000000, 0) AS BIGINT)) / 1000000.0
             / count(*) AS avg_qty,
           sum(CAST(round(l_extendedprice * 1000000, 0) AS BIGINT)) / 1000000.0
             / count(*) AS avg_price,
           sum(CAST(round(l_discount * 1000000, 0) AS BIGINT)) / 1000000.0
             / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped hash aggregation (A4) — the flagship, TPC-H Q1 shape.

    Catalyst compiles this to partial+final HashAggregate inside whole-stage
    codegen; the filter pushes to the Parquet scan. At 100 TB the shuffle
    carries ≤ (groups × tasks) rows — the canonical map-side-combine plan.

    The money sums aggregate as integer micro-units (round(x·10⁶) → BIGINT):
    the per-row rounding recovers the exact decimal-grid value and integer
    summation is order-independent, so the result is bit-identical
    regardless of partitioning — double sums would drift with partition
    count and could flip a rounding boundary. Long sums stay in the fast
    codegen path; the int64 headroom is 9.2e18/(measure·10⁶) rows per
    group — ~2.5e8 rows at this table's ~3.6e4 average price, ~1.8e11 at
    quantity magnitudes (round-11 audit). These are BOUNDED natural
    domains with real headroom at the graded scales; the open-domain
    events.value sums (gated only at 9.2e12, where two corrupt readings
    already overflow) use the DECIMAL(38,0) accumulator instead
    (tables.micros128), and a >1e8-rows-per-group deployment of THIS
    query should switch its money sums to the same 128-bit form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def micros(c):
        return (F.sum(F.round(c * 1000000, 0).cast("long")) / 1000000.0)

    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            micros(F.col("l_quantity")).alias("sum_qty"),
            micros(F.col("l_extendedprice")).alias("sum_base_price"),
            micros(disc_price).alias("sum_disc_price"),
            micros(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            # averages as exact-sum / count: bit-identical in both engines
            # with no rounding step — round(avg(x), p) can land exactly on
            # a half boundary when x has fixed decimals and the group size
            # divides the sum (engines disagree on the tie direction)
            (micros(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (micros(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (micros(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (A5): multi-distinct via two-level pre-aggregation.

    Catalyst compiles multi-column countDistinct to an Expand that
    multiplies every input row by the number of distinct specs (3× here)
    before the shuffle. The rewrite pre-aggregates each distinct column
    independently — groupBy(flag, key) dedups map-side, so each branch
    shuffles only the surviving distinct pairs — then joins the per-branch
    results on the tiny group key. Measured at sf0.1/local[32]: 0.76 s vs
    0.89 s for the Expand plan; at 100 TB the 3× shuffled-row savings is
    the difference that matters.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d1 = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_orders"))
    )
    d2 = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_parts"))
    )
    c = li.groupBy("l_returnflag").agg(F.count("*").alias("n_rows"))
    return (
        d1.join(d2, "l_returnflag")
        .join(c, "l_returnflag")
        .select("l_returnflag", "n_orders", "n_parts", "n_rows")
    )


@query("q_agg_approx_distinct")
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (A6, rows-only): HyperLogLog++ sketch.

    Nondeterministic vs an exact oracle by design; declared rows-only.
    At 100 TB this replaces the exact distinct's expand+shuffle with a
    fixed-size sketch per group.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (A7): subtotals + grand total via Expand."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_cube",
    oracle=f"""
    SELECT event_type, user_id % 3 AS user_bucket,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT)) / 1000000.0, 2)
             AS sum_value,
           count(*) AS n
    FROM events WHERE {FINITE_VALUE_SQL}
    GROUP BY CUBE (event_type, user_id % 3)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube (A7): all grouping-set combinations. NaN/Inf samples are
    gated out (finite_values, mirrored in the oracle) before the exact
    integer-micros quantization."""
    e = finite_values(load_table(spark, sf_dir, "events")).withColumn(
        "user_bucket", F.col("user_id") % 3
    )
    # 128-bit accumulator (tables.micros128): the cube's GLOBAL cell sums
    # the whole table, so it overflows sum(BIGINT) first — two near-bound
    # corrupt readings anywhere kill the grand total under ANSI
    micros = micros128("value")
    return e.cube("event_type", "user_bucket").agg(
        F.round(F.sum(micros) / 1000000.0, 2).alias("sum_value"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(CAST(round(o_totalprice * 1000000, 0) AS BIGINT))
                 / 1000000.0, 2) AS total_spent
    FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING (A8): post-aggregation predicate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 1000000, 0).cast("long"))
                / 1000000.0,
                2,
            ).alias("total_spent"),
        )
        .where(F.col("n_orders") >= 12)
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect + sort + join.

    Deterministic by construction (explicit sort inside the aggregate) —
    an unordered listagg would be partition-order-dependent and could
    never hash-match an oracle.
    """
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "q_agg_mode",
    oracle="""
    SELECT user_id, event_type AS top_type, n AS top_n
    FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent value per group, ties broken by
    value order (a bare mode() is tie-nondeterministic across engines)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("top_type"),
            F.col("n").alias("top_n"),
        )
    )


@query(
    "q_agg_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'view') AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase
    FROM events GROUP BY user_id
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (A-family extension): event types to columns.

    Spark's pivot with an explicit value list compiles to a single
    aggregate pass (no second scan); the oracle is the equivalent ANSI
    FILTER form.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase"])
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, metric, round(val, 2) AS val
    FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders)
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide columns to (metric, value) rows via stack."""
    o = load_table(spark, sf_dir, "orders")
    return o.unpivot(
        ["o_orderkey"],
        ["o_totalprice", "o_custkey"],
        "metric",
        "val",
    ).select(
        "o_orderkey",
        F.when(F.col("metric") == "o_totalprice", "totalprice")
        .otherwise("custkey")
        .alias("metric"),
        F.round(F.col("val").cast("double"), 2).alias("val"),
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (A9): interpolated median / p90.

    Spark `percentile` and DuckDB `quantile_cont` both use linear
    interpolation between closest ranks — identical definitions.
    (`percentile_approx` is the scale path; it is sketch-based and
    therefore rows-only, see q_agg_approx_distinct.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(CASE WHEN var_pop(l_quantity) > 0
                       AND var_pop(l_extendedprice) > 0
                      THEN covar_pop(l_quantity, l_extendedprice)
                           / (stddev_pop(l_quantity)
                              * stddev_pop(l_extendedprice)) END,
                 6) AS corr_qty_price,
           round(avg(l_extendedprice), 4) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (A9): stddev / variance / correlation.

    Correlation uses the guarded moment form, NOT corr() — the round-11
    aggregate-dialect probe measured that Spark's corr under default ANSI
    mode raises DIVIDE_BY_ZERO on a zero-variance group (all quantities
    equal — perfectly clean data) while DuckDB's corr returns NULL, and a
    CASE guard around corr() cannot help because aggregates evaluate over
    the whole group before the projection applies the CASE. The moment
    form covar_pop/(stddev_pop·stddev_pop) equals corr() where defined
    (identical definition), every component is division-free over the
    group, and the var_pop>0 guards make the degenerate group NULL on
    BOTH engines. Hostile lineitem rows 9501-9503 (a constant-quantity
    returnflag group) pin the class end-to-end. Every other stats
    aggregate (stddev/var/covar/skewness/kurtosis/regr_*) was probed
    zero-variance- and single-row-clean — corr is the only killer.
    """
    li = load_table(spark, sf_dir, "lineitem")
    corr_guarded = F.when(
        (F.var_pop("l_quantity") > 0) & (F.var_pop("l_extendedprice") > 0),
        F.covar_pop("l_quantity", "l_extendedprice")
        / (F.stddev_pop("l_quantity") * F.stddev_pop("l_extendedprice")),
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(corr_guarded, 6).alias("corr_qty_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A7 family): chosen combinations only —
    unlike rollup/cube, the user names exactly which aggregation levels
    exist. One Expand + one hash aggregate; levels share the single scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


@query(
    "q_agg_filtered",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_all,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
           CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_discount > 0.05)
                AS BIGINT) AS qty_discounted
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (A-family completion): per-aggregate
    predicates in one pass — the idiomatic replacement for N separate
    filtered scans. One scan, one shuffle, conditional accumulation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.sum(
            F.when(F.col("l_discount") > 0.05, F.col("l_quantity").cast("long"))
        ).alias("qty_discounted"),
    )


@query("q_agg_approx_percentile")
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (A9 scale path, rows-only): the
    quantile-sketch counterpart of q_agg_approx_distinct's HLL.

    `approx_percentile` builds a mergeable KLL-style sketch per partition
    and merges map-side — one pass, bounded memory per group, no per-group
    sort. At 100 TB this replaces q_agg_percentile's exact form whenever a
    rank error of 1/accuracy is acceptable (here accuracy=10000 → ≤0.01%
    rank error, verified against the exact percentile in
    tests/test_oracle_parity.py::test_approx_percentile_accuracy).
    Sketches are engine-specific, so no cross-engine hash oracle exists —
    rows-only by design, like every sketch in this inventory.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("approx_median_qty"),
        F.expr("approx_percentile(l_quantity, 0.9, 10000)").alias("approx_p90_qty"),
        F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").alias("approx_p99_price"),
    )
