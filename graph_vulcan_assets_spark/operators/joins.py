"""Joins (SURVEY.md §2.3).

The reference's "joins" are HTTP key lookups and one-hop graph traversals
(N+1 round trips, acknowledged at cmd/graph-vulcan-assets/main.go:19-20).
Here each becomes a single distributed join with the strategy Catalyst/AQE
picks (broadcast for small dims, sort-merge for big-big), plus the
generalized outer/semi/anti/range/as-of variants.

Scale notes:
- dimension joins (`nation`, `region`, `customer` at small SF) broadcast —
  no shuffle of the fact side;
- the range join is implemented with time-bucketing so it stays an
  equi-join (shuffle-partitionable) instead of a BroadcastNestedLoopJoin,
  which would be quadratic at 100 TB;
- the as-of join uses the equi-key as the shuffle key and resolves the
  temporal predicate with a per-key window, so data is shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table, plausible_times, plausible_ts_sql


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi join (J2): owns ⋈ teams analogue.

    Reference fetches a team per owns edge over HTTP
    (inventory/inventory.go:603-628); here one hash join resolves all of
    them at once.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n_name,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
                    AS BIGINT)) / 1000000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway join + aggregate (J3): TPC-H Q5 shape.

    The one-hop traversal chain of the reference
    (inventory/inventory.go:497-524,572-599) generalized to a 5-table join.
    `nation`/`region` broadcast; AQE reorders/sizes the rest.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            # integer micro-unit sum: order-independent, bit-stable across
            # partition counts, fast codegen path (see q_agg_groupby)
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000,
                        0,
                    ).cast("long")
                )
                / 1000000.0
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join (J4): tiny dimension shipped to every task.

    Reference resolves ids → identifiers row by row in its test readback
    (cmd/graph-vulcan-assets/main_test.go:524-540); a broadcast join is the
    distributed equivalent with zero shuffle of the probe side.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (J5): keep customers with no orders (NULL right side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (J5): EXISTS — customers with an open order.

    Mirrors the reference's "edges whose endpoint is an expired asset"
    membership checks (cmd/graph-vulcan-assets/main.go:270-364).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (J5): NOT EXISTS — customers with no finished orders.

    Mirrors "assets with no active owner" (main.go:305-323). The anti join
    runs against the status='F' subset so survivors exist in the testdata
    (every customer has at least one order of some status).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
    WITH clickers AS (
      SELECT user_id, count(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id),
    buyers AS (
      SELECT user_id, count(*) AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT coalesce(c.user_id, b.user_id) AS user_id,
           coalesce(c.n_clicks, 0) AS n_clicks,
           coalesce(b.n_purchases, 0) AS n_purchases
    FROM clickers c FULL OUTER JOIN buyers b ON c.user_id = b.user_id
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (J5): union of key spaces with null-fill."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    buys = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    c, b = clicks.alias("c"), buys.alias("b")
    return c.join(b, F.col("c.user_id") == F.col("b.user_id"), "full_outer").select(
        F.coalesce(F.col("c.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("c.n_clicks"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("b.n_purchases"), F.lit(0)).alias("n_purchases"),
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT n_name, r_name FROM nation CROSS JOIN region
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (J6 family): explicit Cartesian of two tiny dims.

    Cross joins are only ever acceptable with a provably bounded side; the
    engine's unbounded-pair problems (range join, near-dup, ANN) all use
    bucketing instead.
    """
    n = load_table(spark, sf_dir, "nation").select("n_name")
    r = load_table(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(F.broadcast(r))


@query(
    "q_join_range",
    oracle="""
    SELECT e1.event_id AS a_id, e2.event_id AS b_id, e1.event_type
    FROM events e1 JOIN events e2
      ON e1.event_type = e2.event_type
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join (J6), bucketed so it stays an equi-join.

    Semantics: pairs of same-type events where b follows a within 1 hour —
    the interval-overlap comparisons of the reference's expiry logic
    (cmd/graph-vulcan-assets/main.go:338,354) generalized.

    Scale path: a naive non-equi join is a BroadcastNestedLoopJoin (O(n²)).
    Instead each left row is exploded to the two hour-buckets its window can
    touch and joined on (event_type, bucket) — a plain shuffle hash join —
    then the exact range predicate filters within buckets. This is the
    standard bucketed range-join used by large-scale engines.
    """
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    bucket = F.floor(F.col("ts").cast("long") / 3600)
    a = e.select(
        F.col("event_id").alias("a_id"),
        "event_type",
        F.col("ts").alias("a_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("bkt"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("b_event_type"),
        F.col("ts").alias("b_ts"),
        bucket.alias("bkt"),
    )
    return (
        a.join(b, (a.event_type == b.b_event_type) & (a.bkt == b.bkt))
        .where(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("a_id", "b_id", "event_type")
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT event_id, user_id, o_orderkey, o_orderdate
    FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC NULLS LAST,
                        o.o_orderkey DESC NULLS LAST) AS rn
      FROM events e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
    WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J7): each event matched to the latest prior order.

    The reference answers "state as of t" procedurally via `valid_at`
    (inventory/inventory.go:183-185); relationally it is an as-of join.
    Implementation: equi-join on the key (one shuffle), temporal predicate
    as join condition, then a per-left-row max_by aggregation keeps the
    greatest match with a deterministic tiebreak. max_by beats the
    row_number-window form at scale: it is a hash aggregate with a
    map-side partial phase, so each task pre-reduces its matches to one
    row per event before any shuffle — no per-key sort at all. The oracle
    mirrors the semantics in window form (deterministic tie on orderkey),
    which selects the same row.
    """
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    j = e.join(
        o, (e.user_id == o.o_custkey) & (o.o_orderdate <= e.ts), "left"
    )
    best = F.max_by(
        F.struct(F.col("o_orderkey"), F.col("o_orderdate")),
        F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
    )
    return (
        j.groupBy("event_id")
        .agg(F.first("user_id").alias("user_id"), best.alias("best"))
        .select(
            "event_id",
            "user_id",
            F.col("best.o_orderkey").alias("o_orderkey"),
            F.col("best.o_orderdate").alias("o_orderdate"),
        )
    )


@query(
    "q_upsert_merge",
    oracle=f"""
    WITH state AS (
      SELECT user_id, event_type, value AS state_value,
             first_seen, last_seen
      FROM (
        SELECT user_id, event_type, value,
               min(ts) OVER (PARTITION BY user_id, event_type) AS first_seen,
               max(ts) OVER (PARTITION BY user_id, event_type) AS last_seen,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE {plausible_ts_sql()} AND ts < TIMESTAMP '2024-01-15 00:00:00')
      WHERE rn = 1),
    updates AS (
      SELECT user_id, event_type, value AS upd_value,
             first_seen, last_seen
      FROM (
        SELECT user_id, event_type, value,
               min(ts) OVER (PARTITION BY user_id, event_type) AS first_seen,
               max(ts) OVER (PARTITION BY user_id, event_type) AS last_seen,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE {plausible_ts_sql()} AND ts >= TIMESTAMP '2024-01-15 00:00:00')
      WHERE rn = 1)
    SELECT coalesce(s.user_id, u.user_id) AS user_id,
           coalesce(s.event_type, u.event_type) AS event_type,
           round(coalesce(u.upd_value, s.state_value), 2) AS value,
           coalesce(s.first_seen, u.first_seen) AS first_seen,
           coalesce(u.last_seen, s.last_seen) AS last_seen
    FROM state s FULL OUTER JOIN updates u
      ON s.user_id = u.user_id AND s.event_type = u.event_type
    """,
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert / MERGE (J8) expressed as full-outer-join + coalesce.

    Reference create-vs-update branches per key
    (cmd/graph-vulcan-assets/main.go:145-167,171-195) with first_seen
    preserved and last_seen advanced (inventory/inventory_test.go:407-415).
    Batch-expressible MERGE: state = pre-split snapshot, updates = post-split
    events; matched rows take the update's value but keep the state's
    first_seen — exactly Delta's `WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT`, as one shuffle-on-key full outer join.
    """
    split = "2024-01-15 00:00:00"

    def last_per_key(df: DataFrame) -> DataFrame:
        # one partial/final HashAggregate instead of two window passes +
        # a row_number sort (round 7): min/max/max_by all combine
        # map-side, so the MERGE's snapshot reduction shuffles one
        # candidate per (key, map partition) and a hot key cannot
        # serialize a partition sort — the same argmax-as-aggregate
        # rationale as q_win_last_event
        return df.groupBy("user_id", "event_type").agg(
            F.max_by("value", F.struct("ts", "event_id")).alias("value"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )

    e = plausible_times(load_table(spark, sf_dir, "events"))
    state = last_per_key(e.where(F.col("ts") < split)).withColumnRenamed(
        "value", "state_value"
    )
    updates = last_per_key(e.where(F.col("ts") >= split)).withColumnRenamed(
        "value", "upd_value"
    )
    s, u = state.alias("s"), updates.alias("u")
    return s.join(
        u,
        (F.col("s.user_id") == F.col("u.user_id"))
        & (F.col("s.event_type") == F.col("u.event_type")),
        "full_outer",
    ).select(
        F.coalesce(F.col("s.user_id"), F.col("u.user_id")).alias("user_id"),
        F.coalesce(F.col("s.event_type"), F.col("u.event_type")).alias("event_type"),
        F.round(F.coalesce(F.col("u.upd_value"), F.col("s.state_value")), 2).alias("value"),
        F.coalesce(F.col("s.first_seen"), F.col("u.first_seen")).alias("first_seen"),
        F.coalesce(F.col("u.last_seen"), F.col("s.last_seen")).alias("last_seen"),
    )


@query(
    "q_join_lateral",
    oracle="""
    SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
    FROM nation n,
    LATERAL (SELECT c_custkey, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (J-family completion): per-left-row
    dependent subquery — here top-2 customers by balance per nation, the
    'for each key, run this parameterized query' shape. Catalyst
    decorrelates it; the window/rank form (q_win_topk_group) is the plan
    you'd write by hand, this is the SQL surface users arrive with."""
    from graph_vulcan_assets_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """
    )


@query(
    "q_join_asof_tolerance",
    oracle=f"""
    SELECT event_id, user_id, purchase_id, purchase_ts
    FROM (
      SELECT c.event_id, c.user_id, p.event_id AS purchase_id,
             p.ts AS purchase_ts,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY p.ts ASC NULLS LAST,
                        p.event_id ASC NULLS LAST) AS rn
      FROM (SELECT * FROM events
            WHERE event_type = 'click' AND {plausible_ts_sql()}) c
      LEFT JOIN (SELECT * FROM events
                 WHERE event_type = 'purchase' AND {plausible_ts_sql()}) p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 3 DAY)
    WHERE rn = 1
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, forward direction with tolerance (J7 completion —
    pandas merge_asof's direction='forward', tolerance=3d shape): each
    click attributed to the EARLIEST purchase by the same user
    at-or-after it, but only within 3 days; beyond tolerance the click
    keeps NULL. Both relations are time-compatible slices of ``events``
    (same Jan-2024 range), so both the matched path (earliest-within-band
    min_by + tie-break) and the NULL tolerance-miss path are genuinely
    exercised on the shipped testdata — roughly 3/4 of clicks match and
    the rest fall outside the band.

    Same scale shape as q_join_asof (equi-join shuffle on user_id +
    map-side min_by partial aggregate, no per-key sort) with one
    improvement the backward form can't have: the tolerance BOUNDS the
    temporal band, so a time-bucketed storage layout (sources/layout.py)
    prunes the probe side to a 3-day slice per event instead of all
    history — tolerance is what makes as-of joins tractable on unbounded
    history.
    """
    ev = plausible_times(load_table(spark, sf_dir, "events"))
    c = ev.where(F.col("event_type") == "click").select("event_id", "ts", "user_id")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("ts").alias("p_ts"),
            F.col("user_id").alias("p_user_id"),
        )
    )
    j = c.join(
        p,
        (c.user_id == p.p_user_id)
        & (p.p_ts >= c.ts)
        & (p.p_ts <= F.col("ts") + F.expr("INTERVAL 3 DAY")),
        "left",
    )
    best = F.min_by(
        F.struct(F.col("p_event_id"), F.col("p_ts")),
        F.struct(F.col("p_ts"), F.col("p_event_id")),
    )
    return (
        j.groupBy("event_id")
        .agg(F.first("user_id").alias("user_id"), best.alias("best"))
        .select(
            "event_id",
            "user_id",
            F.col("best.p_event_id").alias("purchase_id"),
            F.col("best.p_ts").alias("purchase_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Interval-overlap join (J6 completion: interval x interval form)
# ---------------------------------------------------------------------------


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Join two interval relations on [start, end) overlap without a
    nested-loop: chunk the timeline, equi-join on the chunk id, filter to
    exact overlap.

    q_join_range is the point-in-interval form; this is the
    interval-x-interval generalization (both sides carry durations —
    sessions vs maintenance windows, validity vs outage, etc.). Each side
    explodes to the chunk ids its interval covers; the join is then a
    plain shuffle equi-join on the 8-byte chunk id. A pair overlapping
    SEVERAL chunks would duplicate, so each pair is emitted only from its
    FIRST shared chunk (chunk == greatest(left first-chunk, right
    first-chunk)) — dedup by construction, no distinct shuffle.

    Inputs need columns (start, end) as timestamps, end exclusive; all
    other columns pass through. Chunk width trades explode fan-out
    against join selectivity — at 100 TB pick it near the median interval
    length so each interval covers O(1) chunks.

    Returns the overlapping pairs with left/right columns prefixed and
    ``overlap_us`` (exact integer micros of intersection).
    """
    cu = chunk_seconds * 1_000_000

    def chunked(df: DataFrame, prefix: str) -> DataFrame:
        s = F.unix_micros(F.col("start"))
        e = F.unix_micros(F.col("end"))
        # degenerate intervals (end <= start) are empty under [start, end)
        # and must produce NO chunks: F.sequence with start > stop would
        # generate a DESCENDING run over chunks the interval doesn't cover,
        # emitting spurious overlap_us=0 pairs (ADVICE r3)
        out = df.where(F.col("start") < F.col("end")).select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns],
            F.floor(s / cu).alias(f"{prefix}c0"),
            F.explode(F.sequence(F.floor(s / cu), F.floor((e - 1) / cu))).alias("chunk"),
        )
        return out

    l = chunked(left, "l_")
    r = chunked(right, "r_")
    pair_first_chunk = F.greatest(F.col("l_c0"), F.col("r_c0"))
    overlap = (F.col("l_start") < F.col("r_end")) & (F.col("r_start") < F.col("l_end"))
    return (
        l.join(r, "chunk")
        .where(overlap & (F.col("chunk") == pair_first_chunk))
        .drop("chunk", "l_c0", "r_c0")
        .withColumn(
            "overlap_us",
            F.least(F.unix_micros("l_end"), F.unix_micros("r_end"))
            - F.greatest(F.unix_micros("l_start"), F.unix_micros("r_start")),
        )
    )


@query(
    "q_join_interval",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS ns
      -- ts IS NOT NULL mirrors session_window(), which drops NULL
      -- event-times; the lag-sessionizer would otherwise give them a
      -- session of their own (NULLS LAST) and shift the join output
      FROM events WHERE ts IS NOT NULL AND {plausible_ts_sql()}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT user_id, ts,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sno
      FROM marked),
    sess AS (
      SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end
      FROM sessioned GROUP BY user_id, sno),
    win AS (
      SELECT DISTINCT date_trunc('hour', ts) AS w_start,
             date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end
      FROM events WHERE event_type = 'purchase' AND {plausible_ts_sql()})
    SELECT user_id,
           s_start AS session_start,
           w_start AS window_start,
           CAST(least(epoch_us(s_end), epoch_us(w_end))
                - greatest(epoch_us(s_start), epoch_us(w_start)) AS BIGINT)
             AS overlap_us
    FROM sess JOIN win ON s_start < w_end AND w_start < s_end
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: 30-min-gap user sessions x hour-long
    purchase-activity windows, both ends exclusive. Chunked equi-join on
    hour ids — never a BNLJ (plan-guarded in tests/test_plans.py)."""
    e = plausible_times(load_table(spark, sf_dir, "events"))
    sess = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "user_id",
            F.col("w.start").alias("start"),
            F.col("w.end").alias("end"),
        )
    )
    win = (
        e.where(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("start"))
        .distinct()
        .select("start", (F.col("start") + F.expr("INTERVAL 1 HOUR")).alias("end"))
    )
    return interval_overlap_join(sess, win).select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_start").alias("session_start"),
        F.col("r_start").alias("window_start"),
        "overlap_us",
    )
