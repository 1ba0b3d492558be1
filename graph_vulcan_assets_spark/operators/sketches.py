"""Mergeable sketch aggregates: persisted HLL rollups (SURVEY.md §2.16).

``q_agg_approx_distinct`` (operators/aggregates.py) answers "how many
distinct right now" with HyperLogLog++ inside one job. This module adds
the piece a 100 TB warehouse actually operates on: **Datasketches HLL
sketches as stored, mergeable partial aggregates** (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, Spark 3.5+).

Why this matters at scale: with plain ``approx_count_distinct`` every
rollup re-reads the raw fact table. With stored leaf sketches, a
coarser-grained rollup is a union over *sketch bytes* — megabytes, not
terabytes — and an incremental day's data only needs its own leaf
sketches built before being unioned into any cube cell. Union of HLL
sketches with the same lgK is exact at the register level, so
``estimate(union(leaves)) == estimate(sketch(all rows))`` — pinned by
``tests/test_sketches.py`` — which is what makes the two-phase plan
semantically safe, not just cheap.

Reference parity: the reference has no sketch surface (its only
aggregation is the stream state rollup, stream/entity.go); this is part
of the engine's warehouse generalization, same §2.16 family as the
histogram/profile operators.

Rows-only correctness: Datasketches HLL estimates are deterministic for a
given input partitioning but have no DuckDB-reproducible oracle; the
pytest suite pins the merge identity, a ≤5 % relative-error bound against
the exact distinct, and the incremental-append property instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# Datasketches lgK: 2^12 registers ≈ 0.8 % standard error, 4 KiB per
# sketch. All sketches in one rollup MUST share lgK or the union degrades
# to the coarser precision.
LG_K = 12


def hll_leaf_sketches(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Finest-grain sketch table: one Datasketches HLL blob per key tuple.

    This is the relation you would persist (e.g. one row per (event_type,
    day)); every coarser rollup below derives from it without touching
    the fact table again. The aggregate is ObjectHashAggregate with a
    map-side partial phase, so the shuffle carries one 4 KiB sketch per
    key per task — never raw rows.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(LG_K)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def hll_rollup(leaves: DataFrame, keys: list[str]) -> DataFrame:
    """Roll leaf sketches up to a coarser key set via register-wise union.

    ``allowDifferentLgConfigK=false``: a silent precision downgrade is a
    correctness hazard in a shared sketch store, so mismatched lgK fails
    loudly instead of merging.
    """
    return leaves.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(False))
        ).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


@query("q_hll_rollup")
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup (rows-only): distinct users per event_type from
    stored per-(event_type, day) leaf sketches.

    The pattern under test is leaf-sketch → union-rollup, i.e. the
    incremental-cube maintenance path. The leaf build is the only pass
    over the fact table; the rollup shuffles key+4 KiB blobs only.
    """
    e = load_table(spark, sf_dir, "events")
    leaves = hll_leaf_sketches(
        e.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
    )
    return hll_rollup(leaves, ["event_type"]).select(
        "event_type", "approx_distinct", "n_rows"
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency table + heavy hitters
# ---------------------------------------------------------------------------

# d hash rows × w counters. w = 256 keeps the sketch table 1024 rows —
# broadcastable at ANY corpus size (that is the point of a sketch: the
# summary's size is fixed while the stream is unbounded).
CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_slot(key, j: int):
    """Deterministic row-j counter index for a key, DuckDB-reproducible.

    Same md5→BIGINT bridge as llm/quality.py: Spark
    ``conv(substring(md5(j||':'||key),1,8),16,10) % w`` equals DuckDB
    ``CAST('0x'||substr(md5(...),1,8) AS BIGINT) % w`` — 32 hex bits fit a
    BIGINT, so no sign/overflow divergence.
    """
    from graph_vulcan_assets_spark.functions.scalars import md5_prefix_long

    h = md5_prefix_long(F.concat(F.lit(f"{j}:"), key))
    return (h % CMS_WIDTH).alias(f"c{j}")


def cms_build(df: DataFrame, col: str) -> DataFrame:
    """(j, c, cnt): count-min sketch table over ``df[col]`` occurrences.

    One explode (×d) + one partial-aggregated shuffle on the (row,
    counter) pair — the map-side combine collapses each partition to at
    most d·w cells before anything moves. The result is MERGEABLE by
    cell-wise sum: sketches from disjoint batches (or 1000 executors'
    partials) add, the same algebra the HLL leaf store exploits.

    NULL keys are EXCLUDED (here and in cms_estimate, symmetrically):
    a NULL key hashes to NULL cells that no probe can equi-join back,
    which would make the estimate 0 for a positive true count — breaking
    the never-underestimates invariant. Count NULLs with a plain
    conditional aggregate if they matter; a sketch is for the keyed mass.
    """
    key = F.col(col).cast("string")
    df = df.where(key.isNotNull())
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _cms_slot(key, j).alias("c"))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("s")
    )
    return cells.groupBy(F.col("s.j").alias("j"), F.col("s.c").alias("c")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches (missing cells are zero)."""
    return (
        a.unionByName(b)
        .groupBy("j", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str) -> DataFrame:
    """Point-frequency estimates: min over the d counters each key maps
    to. The sketch side is d·w rows — Spark broadcasts it, so estimation
    is a map-side join against the key relation however large it is.
    ``est >= true count`` always (CMS never underestimates) — which is
    why NULL keys are excluded on both build and probe (see cms_build)."""
    key = F.col(col).cast("string")
    keys = keys.where(key.isNotNull())
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _cms_slot(key, j).alias("c"))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("s"),
    ).select(*keys.columns, F.col("s.j").alias("j"), F.col("s.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["j", "c"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


@query(
    "q_cms_heavy_hitters",
    oracle="""
    WITH keyed AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    cells AS (
      SELECT j,
             CAST('0x' || substr(md5(j || ':' || k), 1, 8) AS BIGINT) % 256 AS c
      FROM keyed, unnest(range(0, 4)) AS u(j)),
    sketch AS (SELECT j, c, count(*) AS cnt FROM cells GROUP BY j, c),
    probes AS (
      SELECT DISTINCT user_id,
             j,
             CAST('0x' || substr(md5(j || ':' || CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 256 AS c
      FROM events, unnest(range(0, 4)) AS u(j)),
    est AS (
      SELECT user_id, CAST(min(cnt) AS BIGINT) AS est
      FROM probes JOIN sketch USING (j, c)
      GROUP BY user_id)
    SELECT user_id, est FROM est WHERE est >= 12
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters by count-min estimate: users whose estimated event
    count is >= 12. Deterministic md5 slot hashing makes the whole sketch
    DuckDB-reproducible — the oracle rebuilds the identical d×w table and
    the identical min-over-rows estimates, collisions and all."""
    e = load_table(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id")
    users = e.select("user_id").distinct()
    return cms_estimate(sketch, users, "user_id").where(F.col("est") >= 12)
