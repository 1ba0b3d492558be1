"""Duplicate-group clustering: connected components over similarity edges.

The standard tail of a near-dup pipeline: pair detection (MinHash/Jaccard)
produces EDGES; keeping one document per duplicate GROUP requires the
connected components of that graph. Implemented as iterative min-label
propagation over DataFrames — the dataflow equivalent of large-star /
small-star:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Each iteration is one equi-join + one groupBy-min
(both shuffle on vertex id); convergence needs O(diameter) iterations and
duplicate clusters have tiny diameters in practice. The driver loop only
checks a scalar convergence count per iteration — the data never leaves
the cluster (the same shape GraphX/Pregel uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table


def connected_components(
    edges: DataFrame, src: str = "a_id", dst: str = "b_id", max_iter: int = 60
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    `edges` is an undirected edge list; isolated vertices absent from it
    are their own components by definition (callers union them if needed).

    Non-convergence within ``max_iter`` RAISES instead of returning the
    partial labeling: min-label propagation moves the min one hop per
    iteration, so a duplicate chain longer than ``max_iter`` hops would
    otherwise come back silently SPLIT into several components — and the
    leakage-safe splitter built on this (llm/curation.py) would then put
    one near-dup group on both sides of a train/test cut, the exact
    contamination it exists to prevent. Duplicate clusters have tiny
    diameters in practice; a raise here means the data violated that
    assumption and the caller should rerun with a higher ``max_iter``.
    """
    # localCheckpoint per iteration: truncates lineage — without it each
    # round's plan nests the previous round's and analysis/optimization
    # time grows exponentially with iteration count (the standard trap of
    # iterative DataFrame algorithms)
    # LAZY checkpoints (round 13): each iteration's convergence count —
    # unavoidable — doubles as the materialization of that iteration's
    # checkpointed frame (a LogicalRDD barrier defeats count's pruning),
    # halving the driver actions per iteration; sym/labels materialize
    # inside the first iteration's count job the same way.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=False)
    )

    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        # the update join already sees old and new labels side by side, so
        # the convergence count reads the checkpointed 3-column frame —
        # not a second node-sized equi-join of new labels against old,
        # which at scale doubled the per-iteration shuffle volume
        joined = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        changed = joined.where(F.col("component") != F.col("old_component")).count()
        labels = joined.select("node", "component")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still moving) — the graph has a component of "
            f"diameter > {max_iter}; rerun with a higher max_iter"
        )
    return labels


@query(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 200),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
      FROM toks WHERE len(t) >= 3),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    reach AS (
      SELECT u AS node, u AS lbl FROM edges
      UNION
      SELECT e.u AS node, r.lbl
      FROM reach r JOIN edges e ON e.v = r.node)
    SELECT node AS doc_id, min(lbl) AS component
    FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark, sf_dir) -> DataFrame:
    """Duplicate-group clustering (X2 tail): exact-Jaccard edges (≥0.5,
    bounded doc_id<200 pairset as in q_dedup_ngram — covers the planted
    near-dups at every test SF) → connected components.

    The oracle computes the same components with a recursive CTE
    (min reachable id per node) — iterative dataflow vs recursive SQL,
    identical fixpoint.
    """
    from graph_vulcan_assets_spark.llm.dedup import q_dedup_ngram

    # reuse the exact n-gram Jaccard pairs (bounded, deterministic)
    pairs = (
        q_dedup_ngram(spark, sf_dir)
        .where(F.col("jaccard") >= 0.5)
        .select("a_id", "b_id")
    )
    comps = connected_components(pairs)
    return comps.select(F.col("node").alias("doc_id"), "component")


def keep_one_per_cluster(docs: DataFrame, components: DataFrame) -> DataFrame:
    """Final dedup: keep the lowest doc_id of each duplicate group plus
    every unclustered document. The keeper IS the component label
    (component = min reachable id by contract), so no per-group
    aggregation is needed — just the rows labeled by themselves."""
    keepers = components.where(F.col("doc_id") == F.col("component"))
    clustered = components.select("doc_id")
    survivors = docs.join(clustered, "doc_id", "left_anti").select("doc_id").unionByName(
        keepers.select("doc_id")
    )
    return docs.join(survivors, "doc_id", "left_semi")
