"""Projections / filters / predicates (SURVEY.md §2.2).

Re-expresses the reference's event-gating and lookup predicates:
- header extraction & null guards (vulcan/vulcan.go:136-156)
- semver version gate (vulcan/vulcan.go:160-180)
- message-key split (vulcan/vulcan.go:127-133)
- AWS account regex normalization (cmd/graph-vulcan-assets/main.go:245-262)
- exact-match lookups (inventory/inventory.go:173-193)
- point-in-time `valid_at` interval filter (inventory/inventory.go:183-185)

All predicates are built-in Column expressions, so Catalyst pushes them into
the Parquet scan (visible as PushedFilters in `.explain`) — essential at
100 TB where a non-pushed filter means reading everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table, plausible_times, plausible_ts_sql


def _filter_notnull_oracle() -> str:
    from graph_vulcan_assets_spark.functions.scalars import json_parseable_sql

    return f"""
    SELECT event_id, user_id, event_type, props
    FROM events
    WHERE props IS NOT NULL
      -- CASE guard mirrors get_json_object's NULL-on-malformed (DuckDB's
      -- extractor raises on a malformed payload; Spark filters it out).
      -- Shared pre-parse sanitization (NUL strip r7, lone-surrogate
      -- delete r8) + shared parse envelope (r9: trailing garbage, deep
      -- nesting, huge numbers, NaN/Infinity — the Jackson/yyjson
      -- asymmetric classes); see functions/scalars.py json_parseable_sql
      AND CASE WHEN json_valid({json_parseable_sql('props')})
               THEN json_extract_string({json_parseable_sql('props')}, '$.k')
          END IS NOT NULL
    """


@query("q_filter_notnull", oracle=_filter_notnull_oracle())
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-guard predicate (P1): mandatory-field check as a filter.

    Reference errors when a mandatory header is missing
    (vulcan/vulcan.go:136-156); the engine splits valid rows by predicate.
    Round 9: the mandatory-field probe reads through json_parseable (the
    shared Jackson/yyjson parse envelope) so a payload both engines
    cannot agree on is FILTERED, not a divergence.
    """
    from graph_vulcan_assets_spark.functions.scalars import json_parseable

    e = load_table(spark, sf_dir, "events")
    return e.where(
        F.col("props").isNotNull()
        & F.get_json_object(json_parseable("props"), "$.k").isNotNull()
    ).select("event_id", "user_id", "event_type", "props")


@query(
    "q_semver_gate",
    oracle="""
    WITH v AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0
                  THEN 'v' || CAST(event_id % 3 AS VARCHAR) || '.1'
                  ELSE 'v' || CAST(event_id % 3 AS VARCHAR) || '.'
                       || CAST(user_id AS VARCHAR) || '.1'
             END AS version
      FROM events)
    SELECT event_id, version FROM v
    WHERE len(string_split(regexp_replace(version, '^v', ''), '.')) >= 3
      AND CAST(string_split(regexp_replace(version, '^v', ''), '.')[1] AS INT) = 0
    """,
)
def q_semver_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semver gate (P2): accept iff ≥3 dot-parts and major version == 0.

    Reference: vulcan/vulcan.go:160-180 — tolerates a leading 'v' and leading
    zeros, requires ≥3 parts, accepts major == 0 only (test cases
    vulcan/vulcan_test.go:226-267). The version column is synthesized from
    event ids (deterministically) since testdata has no semver column.
    """
    e = load_table(spark, sf_dir, "events")
    version = F.when(
        F.col("event_id") % 7 == 0,
        F.concat(F.lit("v"), (F.col("event_id") % 3).cast("string"), F.lit(".1")),
    ).otherwise(
        F.concat(
            F.lit("v"),
            (F.col("event_id") % 3).cast("string"),
            F.lit("."),
            F.col("user_id").cast("string"),
            F.lit(".1"),
        )
    )
    parts = F.split(F.regexp_replace(F.col("version"), "^v", ""), r"\.")
    return (
        e.withColumn("version", version)
        .where((F.size(parts) >= 3) & (F.element_at(parts, 1).cast("int") == 0))
        .select("event_id", "version")
    )


@query(
    "q_split_key",
    oracle="""
    WITH k AS (
      SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN CAST(user_id AS VARCHAR)
                  ELSE CAST(user_id AS VARCHAR) || '/' || CAST(event_id AS VARCHAR)
             END AS key
      FROM events)
    SELECT event_id, string_split(key, '/')[1] AS team_id,
           string_split(key, '/')[2] AS asset_id
    FROM k WHERE len(string_split(key, '/')) = 2
    """,
)
def q_split_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-key split (P3): "<team>/<asset>" → columns, reject malformed.

    Reference: vulcan/vulcan.go:127-133 (error unless exactly 2 parts).
    Rows with event_id % 11 == 0 are synthesized malformed (no slash) and
    must be filtered out.
    """
    e = load_table(spark, sf_dir, "events")
    key = F.when(
        F.col("event_id") % 11 == 0, F.col("user_id").cast("string")
    ).otherwise(
        F.concat_ws("/", F.col("user_id").cast("string"), F.col("event_id").cast("string"))
    )
    parts = F.split(F.col("key"), "/")
    return (
        e.withColumn("key", key)
        .where(F.size(parts) == 2)
        .select(
            "event_id",
            F.element_at(parts, 1).alias("team_id"),
            F.element_at(parts, 2).alias("asset_id"),
        )
    )


@query(
    "q_explode_filter",
    oracle="""
    SELECT vec_id, pos, round(CAST(val AS DOUBLE), 6) AS val
    FROM (
      SELECT vec_id,
             unnest(embedding) AS val,
             unnest(range(len(embedding))) AS pos
      FROM embeddings)
    WHERE val > 0.3
    """,
)
def q_explode_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode + filter (P4): annotations-by-key analogue.

    Reference iterates annotation arrays keeping matching keys
    (cmd/graph-vulcan-assets/main.go:131-138); here posexplode over the
    embedding array keeps components > 0.3 (testdata max component is
    ~0.458, so the filter actually selects a non-empty minority).
    """
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .where(F.col("val") > 0.3)
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
    )


@query(
    "q_regex_normalize",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             lpad(CAST(CAST((CAST(user_id AS HUGEINT) * 81234567 + event_id)
                             % 1000000000000 AS BIGINT) AS VARCHAR),
                  12, '0') AS acct,
             event_id % 3 AS form
      FROM events),
    shaped AS (
      SELECT event_id,
             CASE form
               WHEN 0 THEN acct
               WHEN 1 THEN 'arn:aws:iam::' || acct || ':root'
               ELSE substr(acct, 1, 10) || 'ab'
             END AS raw_account
      FROM raw)
    SELECT event_id, raw_account,
           CASE
             WHEN regexp_full_match(raw_account, 'arn:aws:iam::[0-9]{12}:root')
               THEN raw_account
             WHEN regexp_full_match(raw_account, '[0-9]{12}')
               THEN 'arn:aws:iam::' || raw_account || ':root'
             ELSE NULL
           END AS normalized
    FROM shaped
    """,
)
def q_regex_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex validate + normalize AWS account ids (P5).

    Reference: cmd/graph-vulcan-assets/main.go:245-262 — 12-digit short form
    becomes `arn:aws:iam::<id>:root`, long form passes through, anything else
    errors (here: NULL). Test vectors: main_test.go:674-720.
    """
    e = load_table(spark, sf_dir, "events")
    # 128-bit product: a raw BIGINT multiply overflows under ANSI once
    # user_id is a genuine random 64-bit id (extreme-id probe, round 6);
    # DECIMAL(38,0) mirrors the oracle's HUGEINT, and the remainder fits
    # BIGINT again. Identical digits for every in-range id.
    acct = F.lpad(
        (
            (F.col("user_id").cast("decimal(38,0)") * 81234567 + F.col("event_id"))
            % 1000000000000
        )
        .cast("long")
        .cast("string"),
        12,
        "0",
    )
    raw = (
        F.when(F.col("event_id") % 3 == 0, acct)
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(F.lit("arn:aws:iam::"), acct, F.lit(":root")),
        )
        .otherwise(F.concat(F.substring(acct, 1, 10), F.lit("ab")))
    )
    long_re = "^arn:aws:iam::[0-9]{12}:root$"
    short_re = "^[0-9]{12}$"
    normalized = (
        F.when(F.col("raw_account").rlike(long_re), F.col("raw_account"))
        .when(
            F.col("raw_account").rlike(short_re),
            F.concat(F.lit("arn:aws:iam::"), F.col("raw_account"), F.lit(":root")),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        e.withColumn("raw_account", raw)
        .select("event_id", "raw_account", normalized.alias("normalized"))
    )


@query(
    "q_filter_eq",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase' AND user_id = 7 AND {plausible_ts_sql()}
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-match lookup (P6): natural-key equality, never prefix.

    Reference: inventory/inventory.go:173-193 — assets fetched by exact
    (type, identifier); partial matches return empty
    (inventory/inventory_test.go:299-314). Both predicates push down to the
    Parquet scan.
    """
    e = plausible_times(load_table(spark, sf_dir, "events"))
    return e.where(
        (F.col("event_type") == "purchase") & (F.col("user_id") == 7)
    ).select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "q_valid_at",
    oracle=f"""
    SELECT event_id, user_id, ts,
           ts + INTERVAL 7 DAY AS expiration
    FROM events
    WHERE {plausible_ts_sql()}
      AND ts <= TIMESTAMP '2024-01-15 00:00:00'
      AND ts + INTERVAL 7 DAY >= TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def q_valid_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time filter (P7): validity interval covers the probe instant.

    Reference: inventory/inventory.go:183-185, semantics pinned by
    inventory/inventory_test.go:291-298 (interval [first_seen, expiration]
    must cover `valid_at`). Each event's validity is [ts, ts + 7 days].
    """
    e = plausible_times(load_table(spark, sf_dir, "events"))
    probe = F.lit("2024-01-15 00:00:00").cast("timestamp")
    expiration = F.col("ts") + F.expr("INTERVAL 7 DAYS")
    return (
        e.where((F.col("ts") <= probe) & (expiration >= probe))
        .select("event_id", "user_id", "ts", expiration.alias("expiration"))
    )


@query(
    "q_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 30
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates (P8): date + numeric BETWEEN (TPC-H Q6 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 30)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_discount")


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (generalization): above-average filter.

    Expressed through the SQL surface so Catalyst's subquery handling is
    exercised (the scalar subquery becomes a one-row broadcast). The avg
    is compared, not output, so double-vs-double comparison noise cannot
    flip membership except for a row exactly AT the average — impossible
    here (avg of 15k 2-decimal values has ~10 decimal digits).
    """
    from graph_vulcan_assets_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


@query(
    "q_subquery_exists_corr",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def q_subquery_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery (generalization): decorrelated by
    Catalyst into a left-semi join — the declarative form of the
    reference's per-row existence lookups (main.go:305-323)."""
    from graph_vulcan_assets_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _lt(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        """
    )


@query(
    "q_filter_in_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_name LIKE 'Customer#00000001%'
    """,
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE composition (P9)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_name").like("Customer#00000001%")
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_subquery_not_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'F')
    """,
)
def q_subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery (P-family generalization): three-valued-logic
    anti membership. Catalyst plans this as a NULL-AWARE anti join —
    semantically distinct from LEFT ANTI (one NULL in the subquery empties
    the result); here the subquery column is non-null so the answer is the
    customers without 'F'-status orders (non-vacuous at sf0.01)."""
    from graph_vulcan_assets_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'F')
        """
    )
