"""Entity resolution / record linkage (SURVEY.md §2.16): blocked
candidate generation + edit-distance matching.

The reference treats identity as exact natural keys (duplicated-asset
hard error, cmd/graph-vulcan-assets/main.go:151-166); real inventories
have NEAR-duplicate entities (typos, re-registrations), and resolving
them is the same candidate-generation discipline as the text dedup
family: never all-pairs. Blocking = an equi-join on a cheap key (name
prefix + nation here) that bounds each comparison group, then the
expensive pairwise similarity (Levenshtein) runs only inside blocks —
O(Σ block²) with block sizes controlled by the blocking key, the exact
shape MinHash banding gives the text dedup (llm/dedup.py).

At 100 TB: the blocking key is the shuffle key; a hot block (common
surname) is the skew risk, handled the same way as any skewed join
(salting/AQE — operators/skew.py). Levenshtein cost is per candidate
pair, not per row pair.

Determinism: Levenshtein is an exact integer; both engines implement the
classic unit-cost edit distance, so the driver hash-compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

_BLOCK_PREFIX = 16
_MAX_DIST = 1


def candidate_pairs(
    entities: DataFrame,
    key: str,
    name: str,
    block_cols: list[str],
    max_dist: int = _MAX_DIST,
) -> DataFrame:
    """Blocked near-match pairs: equi-join on the block columns, keep
    (a < b) pairs within ``max_dist`` edits."""
    a = entities.select(
        *block_cols,
        F.col(key).alias("a_key"),
        F.col(name).alias("a_name"),
    )
    b = entities.select(
        *block_cols,
        F.col(key).alias("b_key"),
        F.col(name).alias("b_name"),
    )
    return (
        a.join(b, block_cols)
        .where(F.col("a_key") < F.col("b_key"))
        .withColumn("dist", F.levenshtein(F.col("a_name"), F.col("b_name")))
        .where(F.col("dist") <= max_dist)
    )


@query(
    "q_entity_pairs",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey,
             substr(c_name, 1, {_BLOCK_PREFIX}) AS blk
      FROM customer)
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           CAST(a.c_nationkey AS BIGINT) AS nation,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM c a JOIN c b
      ON a.blk = b.blk AND a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {_MAX_DIST}
    """,
)
def q_entity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer record-linkage candidates: same (name-prefix, nation)
    block, names within 1 edit.

    The pair list a downstream merge review (or the connected-components
    canonicalizer, llm/clustering.py) consumes. Block = 16-char name
    prefix + nationkey; pairwise Levenshtein only inside blocks.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring("c_name", 1, _BLOCK_PREFIX).alias("blk"),
    )
    pairs = candidate_pairs(
        c, "c_custkey", "c_name", ["blk", "c_nationkey"], _MAX_DIST
    )
    return pairs.select(
        F.col("a_key").alias("a_key"),
        F.col("b_key").alias("b_key"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("dist").cast("long").alias("dist"),
    )
