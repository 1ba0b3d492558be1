"""Fixed-point Lloyd k-means over the embeddings table — deterministic,
oracle-checked clustering for corpus organization (topic bucketing,
stratified curation, IVF coarse quantizers).

The reference has no clustering surface (its "grouping" is the stream
state rollup, stream/entity.go); this is the k-means the IVF ANN index in
``llm/similarity.py`` would train its coarse quantizer with, made
driver-checkable with the same trick as PageRank (operators/graph.py):
ALL arithmetic is integer, so results are independent of summation order
and match the DuckDB oracle bit-for-bit —

* components quantize to exact integer micro-units
  (``CAST(round(CAST(e AS DOUBLE) * 1e6, 0) AS BIGINT)``);
* squared-L2 distances are BIGINT sums (≤ 64 · (2e6)² ≈ 2.6e14, far from
  overflow);
* centroid updates use truncated integer means
  ``(sum - sum % cnt) / cnt`` — written that way (not ``DIV`` / ``//``)
  because Spark and DuckDB agree on truncated ``%`` but differ on
  integer-division flavor;
* argmin ties break on the lowest centroid id via ``row_number`` ordered
  by (distance, cid).

Scale shape (round 12, the packed plan): vectors stay PACKED as one
(vec_id, qarr) row each — the finite gate guarantees every post-gate
vector is exactly EMBED_DIM long with no NULL/NaN components, so array
arithmetic is defined everywhere. Assignment is MAP-ONLY: the k·d
centroid table collapses to a single array-of-structs row, broadcast to
every task via a constant-key hash join, and each vector computes its
argmin centroid inside one projection (``array_min`` over per-centroid
``zip_with``/``aggregate`` squared distances, ties on the lowest cid by
struct ordering) — no n·d·k join intermediate, no per-vector shuffle, no
window sort. Only the centroid UPDATE shuffles: posexplode of the
assigned vectors partially aggregates map-side to ≤ k·d rows per task.
No driver-side state, no UDFs; per-iteration lineage is truncated with
``localCheckpoint`` exactly like :func:`operators.graph.q_graph_pagerank`.
(The previous exploded plan — (vec_id, pos, q) joined with broadcast
centroids ON pos — materialized n·d·k rows per iteration and sorted n·k
rows per argmin window; measured 2.04 s → this plan at sf0.1, identical
hashes. The DuckDB oracle keeps the exploded CTE form; integer
arithmetic makes the two groupings bit-identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.embeddings import finite_sql
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import attach_scalar, load_table

K = 8
ITERS = 3
_SCALE = 1_000_000

# the corrupt-vector gate comes from the single source of truth
# (llm/embeddings.py finite_sql — interpolated, NOT copied, so a gate fix
# propagates here and to llm/semdedup.py's oracle automatically): without
# it a single NaN component crashes the micros CAST on both engines, and
# a wrong-dimension vector silently skews its own distance sums
_VECS_SQL = f"""
      SELECT vec_id,
             unnest(range(len(embedding))) AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
      FROM embeddings
      WHERE {finite_sql("embedding")}
"""


def lloyd_ctes(k: int = K, iters: int = ITERS) -> str:
    """The Lloyd iteration chain as CTE text, parameterized over a ``vecs``
    CTE the caller supplies (llm/semdedup.py reuses this on an augmented
    vector set). Final assignment is ``a{iters}``."""
    sql = f"""
    c0 AS (SELECT vec_id AS cid, pos, q AS c FROM vecs WHERE vec_id < {k})"""
    for i in range(1, iters + 1):
        sql += f""",
    d{i} AS (SELECT v.vec_id, c.cid, sum((v.q - c.c) * (v.q - c.c)) AS d
             FROM vecs v JOIN c{i - 1} c ON v.pos = c.pos
             GROUP BY v.vec_id, c.cid),
    a{i} AS (SELECT vec_id, cid, CAST(d AS BIGINT) AS d FROM (
               SELECT vec_id, cid, d,
                      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
               FROM d{i}) WHERE rn = 1),
    c{i} AS (SELECT a.cid, v.pos,
                    CAST((sum(v.q) - (sum(v.q) % count(*))) / count(*) AS BIGINT) AS c
             FROM a{i} a JOIN vecs v ON v.vec_id = a.vec_id
             GROUP BY a.cid, v.pos)"""
    return sql


def _kmeans_oracle(k: int = K, iters: int = ITERS) -> str:
    """Unrolled Lloyd iterations as chained CTEs (same pattern as the
    PageRank oracle — DuckDB can't aggregate inside recursive CTEs)."""
    sql = f"""
    WITH vecs AS ({_VECS_SQL}),{lloyd_ctes(k, iters)}"""
    sql += f"""
    SELECT vec_id, cid, d AS dist_sq FROM a{iters}"""
    return sql


def quantize_vectors(emb: DataFrame) -> DataFrame:
    """embeddings → PACKED integer-micro (vec_id, qarr) rows, checkpointed
    once so every Lloyd iteration (and any reuser, e.g. llm/semdedup.py)
    reads the materialized quantization. Map-only: no explode — the packed
    checkpoint is d× smaller than the old exploded one, and the finite
    gate (len = EMBED_DIM, all components finite) makes packed array
    arithmetic exactly equivalent to the exploded join form."""
    from graph_vulcan_assets_spark.llm.embeddings import finite_embeddings

    return (
        finite_embeddings(emb)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda e: F.round(e.cast("double") * _SCALE, 0).cast("long"),
            ).alias("qarr"),
        )
        .localCheckpoint(eager=True)
    )


def centroid_pack(cent: DataFrame) -> DataFrame:
    """(cid, carr) k rows → ONE row holding the cid-sorted array of
    centroid structs — the broadcastable form the map-only assignment
    consumes. collect_list order is nondeterministic; array_sort restores
    the total (cid) order, so the pack is deterministic."""
    return cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "carr"))).alias("cents")
    )


def packed_sq_dist(qarr, carr):
    """Exact BIGINT squared L2 between two packed micro-arrays — the same
    sum the exploded join computed, regrouped (integer, order-free)."""
    return F.aggregate(
        F.zip_with(qarr, carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )




def lloyd_assign(vecs: DataFrame, k: int = K, iters: int = ITERS) -> DataFrame:
    """Fixed-point Lloyd over packed (vec_id, qarr) — the Spark twin of
    :func:`lloyd_ctes`; returns (vec_id, cid, d, qarr). See module
    docstring for the exactness contract and the packed plan shape.

    The argmin is ``array_min`` over (d, cid) structs — lexicographic
    struct ordering reproduces the oracle's ``row_number() ORDER BY d,
    cid`` tie-break exactly.
    """
    cent = vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("qarr").alias("carr")
    )
    assigned = None
    for i in range(iters):
        best = F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    packed_sq_dist(F.col("qarr"), c["carr"]).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        assigned = (
            attach_scalar(vecs, centroid_pack(cent), "cents")
            .select("vec_id", best.alias("__best"), "qarr")
            .select(
                "vec_id",
                F.col("__best.cid").alias("cid"),
                F.col("__best.d").alias("d"),
                "qarr",
            )
        )
        if i < iters - 1:
            # truncate lineage at the CENTROID table (k·d rows — the tiny
            # relation each next iteration broadcasts), not the full
            # assignment: one small materialization per iteration and the
            # final assignment executes as a single job from the last
            # checkpointed centroids. The update is the only shuffle per
            # iteration; partial aggregation collapses it to ≤ k·d rows
            # per map task before the exchange.
            cent = (
                assigned.select("cid", F.posexplode("qarr").alias("pos", "q"))
                .groupBy("cid", "pos")
                .agg(
                    ((F.sum("q") - F.sum("q") % F.count("*")) / F.count("*"))
                    .cast("long")
                    .alias("c")
                )
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "c"))),
                        lambda s: s["c"],
                    ).alias("carr")
                )
                .localCheckpoint(eager=True)
            )
    assert assigned is not None
    return assigned


@query("q_kmeans_assign", oracle=_kmeans_oracle())
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 fixed-point Lloyd k-means, 3 iterations, seeded from the first
    k vectors; returns every vector's final (cluster, exact squared
    distance). See module docstring for the exactness contract."""
    vecs = quantize_vectors(load_table(spark, sf_dir, "embeddings"))
    assign = lloyd_assign(vecs, K, ITERS)
    return assign.select("vec_id", "cid", F.col("d").cast("long").alias("dist_sq"))
