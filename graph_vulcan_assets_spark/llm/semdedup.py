"""Semantic deduplication — SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
as a composition of the integer-exact k-means and a cluster-bucketed
cosine pair scan (SURVEY.md §2.16).

The scale story IS the algorithm: pairwise cosine over a 100 TB corpus is
O(n²) and impossible, so SemDeDup first k-means-clusters the embeddings
and only compares WITHIN clusters — k is chosen so the expected cluster
size is bounded, making the pair stage O(n²/k), an equi-join keyed by
(cluster, position), never a cross join. This module reuses
``llm/kmeans.py`` verbatim for stage 1 (same fixed-point Lloyd, so the
cluster assignment is bit-identical in Spark and the oracle) and runs
stage 2 as a (cid, pos)-keyed self-join → BIGINT dot products → exact
threshold test.

Determinism contract: dot products and squared norms are BIGINT sums of
integer-micro components (order-independent, exact). The cosine test
``cos(a,b) >= τ`` is evaluated as ``dot > 0 AND dot² >= τ²·|a|²·|b|²``
entirely in doubles built from those exact integers with an identical
expression tree on both engines — same IEEE operands, same ops, same
result — so the driver hash-compare is exact at any partition count.

Vacuity guard: the synthetic embeddings are pairwise-random (max organic
cosine ≈ 0.51 at sf0.01), so a real near-dup threshold would output zero
rows and prove nothing (the round-1/round-2 vacuity lesson). Both engines
therefore first inject deterministic near-copies — every 50th vector gets
a twin at ``vec_id + 1_000_000`` with components perturbed by
``(pos % 3) - 1`` micro-units — and the query provably finds exactly the
injected duplicates through the full cluster → pair → threshold path.

Reference parity: no dedup surface in the reference; this completes the
X2 dedup family (exact → MinHash/SimHash/containment → semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.kmeans import (
    ITERS,
    K,
    _VECS_SQL,
    lloyd_assign,
    lloyd_ctes,
    quantize_vectors,
)
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# τ = 0.99 → τ² = 0.9801 (written as the literal so both engines parse the
# identical double; never computed as 0.99*0.99 at runtime).
_TAU_SQ = 0.9801
_TWIN_OFFSET = 1_000_000
_TWIN_EVERY = 50


def _augmented(vecs: DataFrame) -> DataFrame:
    """vecs ∪ near-copy twins of every 50th vector (the vacuity guard).

    Operates on PACKED (vec_id, qarr) vectors (llm/kmeans.py round-12
    plan); the per-component perturbation uses transform's index lambda —
    the same ``(pos % 3) - 1`` the oracle applies to its exploded form.
    """
    twins = vecs.where(F.col("vec_id") % _TWIN_EVERY == 0).select(
        (F.col("vec_id") + _TWIN_OFFSET).alias("vec_id"),
        F.transform("qarr", lambda q, i: q + (i % 3 - 1)).alias("qarr"),
    )
    return vecs.unionAll(twins)


_AUG_SQL = f"""
    base AS ({_VECS_SQL}),
    vecs AS (
      SELECT vec_id, pos, q FROM base
      UNION ALL
      SELECT vec_id + {_TWIN_OFFSET} AS vec_id, pos,
             q + (pos % 3 - 1) AS q
      FROM base WHERE vec_id % {_TWIN_EVERY} = 0
    )"""


def _semdedup_oracle() -> str:
    return f"""
    WITH{_AUG_SQL},{lloyd_ctes(K, ITERS)},
    norms AS (
      SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS nrm
      FROM vecs GROUP BY vec_id),
    dots AS (
      SELECT la.vec_id AS v1, lb.vec_id AS v2, la.cid,
             CAST(sum(va.q * vb.q) AS BIGINT) AS dot
      FROM a{ITERS} la
      JOIN a{ITERS} lb ON lb.cid = la.cid AND lb.vec_id > la.vec_id
      JOIN vecs va ON va.vec_id = la.vec_id
      JOIN vecs vb ON vb.vec_id = lb.vec_id AND vb.pos = va.pos
      GROUP BY la.vec_id, lb.vec_id, la.cid),
    dups AS (
      SELECT d.v2 AS vec_id, d.cid, d.v1
      FROM dots d
      JOIN norms n1 ON n1.vec_id = d.v1
      JOIN norms n2 ON n2.vec_id = d.v2
      WHERE d.dot > 0
        AND CAST(d.dot AS DOUBLE) * CAST(d.dot AS DOUBLE)
            >= CAST({_TAU_SQ} AS DOUBLE)
               * CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE))
    SELECT vec_id, cid, CAST(min(v1) AS BIGINT) AS dup_of
    FROM dups GROUP BY vec_id, cid
    """


def semantic_dedup(
    vecs: DataFrame, k: int, iters: int = ITERS, tau_sq: float = _TAU_SQ
) -> DataFrame:
    """SemDeDup over packed quantized (vec_id, qarr) vectors.

    ``k`` is the scale lever: the pair stage does O(d·Σ cluster_size²)
    work, so k MUST grow with the corpus to keep cluster sizes bounded
    (SemDeDup uses k ≈ n/‹target cluster size›; with k fixed the stage
    degrades to O(n²/k)). The registered query below pins k=8 only
    because its DuckDB oracle unrolls that exact clustering; callers
    dedup-ing a real corpus pass k ∝ n.
    """
    # lloyd_assign (packed plan, llm/kmeans.py round 12) already returns
    # each vector as ONE compact (vec_id, cid, qarr) row — the pair stage
    # consumes it directly: no re-pack groupBy, no assignment join. The
    # within-cluster self-join produces |c|² pair rows (not d·|c|²
    # component rows) and the dot product runs via zip_with + aggregate
    # on the two arrays; nrm is the same exact BIGINT Σq² as the old
    # exploded sum, computed map-side from the array.
    packed = lloyd_assign(vecs, k, iters).select(
        "vec_id",
        "cid",
        "qarr",
        F.aggregate(
            F.transform("qarr", lambda q: q * q),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("nrm"),
    )
    a = packed.select(
        F.col("cid"),
        F.col("vec_id").alias("v1"),
        F.col("qarr").alias("arr1"),
        F.col("nrm").alias("n1"),
    )
    b = packed.select(
        F.col("cid"),
        F.col("vec_id").alias("v2"),
        F.col("qarr").alias("arr2"),
        F.col("nrm").alias("n2"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("arr1"), F.col("arr2"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(b, "cid")
        .where(F.col("v2") > F.col("v1"))
        .select("cid", "v1", "v2", "n1", "n2", dot.alias("dot"))
    )
    dotd = F.col("dot").cast("double")
    dups = pairs.where(
        (F.col("dot") > 0)
        & (
            dotd * dotd
            >= F.lit(tau_sq)
            * F.col("n1").cast("double")
            * F.col("n2").cast("double")
        )
    )
    return dups.groupBy(F.col("v2").alias("vec_id"), "cid").agg(
        F.min("v1").cast("long").alias("dup_of")
    )


@query("q_dedup_semantic", oracle=_semdedup_oracle())
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (X2 completion): vectors dropped because a lower-id vector
    in the same k-means cluster has cosine ≥ 0.99.

    Returns (vec_id, cid, dup_of) for every DROPPED vector — dup_of is
    the lowest-id near-duplicate (the keeper under lowest-id-wins).
    Stage 1: Lloyd k-means (llm/kmeans.py, broadcast centroids). Stage 2:
    within-cluster pair dots over packed arrays — shuffle partitionable,
    no cross join anywhere. k is pinned to 8 for the unrolled oracle; see
    :func:`semantic_dedup` for the k-scaling contract at corpus scale.
    """
    vecs = _augmented(
        quantize_vectors(load_table(spark, sf_dir, "embeddings"))
    )
    return semantic_dedup(vecs, K, ITERS)
