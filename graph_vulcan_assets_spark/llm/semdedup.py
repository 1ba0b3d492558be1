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
integer-micro components (order-independent, exact — int64 matmul in the
kernel, BIGINT sum in the oracle). The cosine test ``cos(a,b) >= τ`` is
evaluated as ``dot > 0 AND dot² >= τ²·|a|²·|b|²`` entirely in float64
built from those exact integers with an identical operation sequence on
both engines — same IEEE operands, same ops, same result — so the driver
hash-compare is exact at any partition count.

Round 12: the within-cluster pair stage moved from a (cid-keyed
self-join → per-pair zip_with/aggregate dot) to ONE vectorized numpy
kernel per cluster (``applyInPandas`` — the grouped-map Arrow quadrant):
the m×d cluster block computes all m² exact int64 dots as a single
matmul and emits only the (vec_id, cid, dup_of) rows that pass τ, so the
|c|² pair rows are never materialized as a join output and the
interpreted per-pair lambda cost (measured ~4.5 s of the 6.7 s entry at
sf0.1) disappears. Work is O(d·Σ|c|²) exactly as before — the kernel
changes the constant, not the asymptotics; cluster blocks are bounded by
the k∝n contract below.

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
    # consumes it directly: no re-pack groupBy, no assignment join. One
    # shuffle on cid, then each cluster block resolves all its pairs in
    # one vectorized kernel (see module docstring).
    assign = lloyd_assign(vecs, k, iters).select("vec_id", "cid", "qarr")
    return assign.groupBy("cid").applyInPandas(
        _cluster_dups_kernel(tau_sq), "vec_id long, cid long, dup_of long"
    )


# Per-worker memory budget for one Gram row-block: block_rows·m int64 +
# the same in float64 ≈ 16·BLOCK_ELEMS bytes ≈ 256 MB. Round 13 (VERDICT
# r12 #2): the unchunked kernel held TWO full m×m matrices resident, so a
# hot cluster ~10× the k∝n mean OOMed the Python worker instead of
# degrading; blocking the matmul over ≤B rows caps resident memory at
# O(B·m) + the m×d block itself, bit-identically (each pass decision is
# the same scalar expression, and blocks scan rows in ascending-id order
# so first-pass row == min v1 exactly as before).
_GRAM_BLOCK_ELEMS = 16 * 1024 * 1024


def _cluster_dups_kernel(tau_sq: float):
    """Per-cluster pair resolution: exact int64 Gram matmul + the float64
    threshold test, emitting (vec_id, cid, dup_of) for DROPPED vectors.

    Exactness: ids sort ascending, so scanning row blocks in order, the
    FIRST row i < j whose pair (i, j) passes is min(v1) — the
    lowest-id-wins keeper rule. Dots/norms are int64 (exact, ≤ d·(2·bound
    ·1e6)² by the EMBED_BOUND gate); the comparison reproduces the
    oracle's ``CAST(dot AS DOUBLE)² >= τ² * n1 * n2`` with the identical
    IEEE operand values and multiplication order, so pass/fail decisions
    are bit-identical to the previous expression form. The Gram matmul is
    blocked over ≤B rows (see :data:`_GRAM_BLOCK_ELEMS`) so per-worker
    memory is O(B·m), not O(m²).
    """

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "cid": pd.Series(dtype="int64"),
                "dup_of": pd.Series(dtype="int64"),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        q = np.array(list(pdf["qarr"]), dtype=np.int64)  # m×d, exact micros
        nrm_i = (q * q).sum(axis=1)  # exact int64 norms
        nrm = nrm_i.astype(np.float64)
        block = max(1, _GRAM_BLOCK_ELEMS // m)
        first_v1 = np.full(m, -1, dtype=np.int64)  # per column: min passing row
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            gram = q[lo:hi] @ q.T  # (hi-lo)×m int64, exact
            dot = gram.astype(np.float64)
            passed = (gram > 0) & (
                dot * dot >= tau_sq * nrm[lo:hi, None] * nrm[None, :]
            )
            # strict upper triangle: row (global i) must be < column j
            cols = np.arange(m)[None, :]
            rows = np.arange(lo, hi)[:, None]
            passed &= rows < cols
            hit = passed.any(axis=0)
            new = hit & (first_v1 < 0)  # earlier blocks have lower ids: keep first
            if new.any():
                first_v1[new] = lo + passed[:, new].argmax(axis=0)
        dropped = first_v1 >= 0
        if not dropped.any():
            return empty
        return pd.DataFrame(
            {
                "vec_id": ids[dropped],
                "cid": np.int64(pdf["cid"].iloc[0]),
                "dup_of": ids[first_v1[dropped]],
            }
        )

    return kernel


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
