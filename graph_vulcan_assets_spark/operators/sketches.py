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
