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

Scale shape: the embedding array is exploded ONCE into (vec_id, pos, q)
and materialized; each Lloyd iteration is then two shuffle-partitionable
relational ops — a (vecs ⋈ centroids ON pos) + per-(vec, cid) aggregate
for assignment (centroids are k·d rows, broadcast), and a per-(cid, pos)
aggregate for the update. No driver-side state, no UDFs; per-iteration
lineage is truncated with ``localCheckpoint`` exactly like
:func:`operators.graph.q_graph_pagerank`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.embeddings import finite_sql
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

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
    """embeddings → exploded integer-micro (vec_id, pos, q), checkpointed
    once so every Lloyd iteration (and any reuser, e.g. llm/semdedup.py)
    reads the materialized quantization instead of re-exploding."""
    from graph_vulcan_assets_spark.llm.embeddings import finite_embeddings

    return (
        finite_embeddings(emb)
        .select("vec_id", F.posexplode("embedding").alias("pos", "e"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("e").cast("double") * _SCALE, 0).cast("long").alias("q"),
        )
        .localCheckpoint(eager=True)
    )


def lloyd_assign(vecs: DataFrame, k: int = K, iters: int = ITERS) -> DataFrame:
    """Fixed-point Lloyd over quantized (vec_id, pos, q) — the Spark twin
    of :func:`lloyd_ctes`; returns (vec_id, cid, d). See module docstring
    for the exactness contract."""
    cent = vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), "pos", F.col("q").alias("c")
    )
    assign = None
    for i in range(iters):
        d = (
            vecs.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d"))
        )
        w = Window.partitionBy("vec_id").orderBy("d", "cid")
        assign = (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "d")
        )
        if i < iters - 1:
            # truncate lineage at the CENTROID table (k·d rows — the tiny
            # relation each next iteration broadcasts), not the full
            # assignment: one small materialization per iteration and the
            # final assignment executes as a single job from the last
            # checkpointed centroids
            cent = (
                assign.join(vecs, "vec_id")
                .groupBy("cid", "pos")
                .agg(
                    ((F.sum("q") - F.sum("q") % F.count("*")) / F.count("*"))
                    .cast("long")
                    .alias("c")
                )
                .localCheckpoint(eager=True)
            )
    assert assign is not None
    return assign


@query("q_kmeans_assign", oracle=_kmeans_oracle())
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 fixed-point Lloyd k-means, 3 iterations, seeded from the first
    k vectors; returns every vector's final (cluster, exact squared
    distance). See module docstring for the exactness contract."""
    vecs = quantize_vectors(load_table(spark, sf_dir, "embeddings"))
    assign = lloyd_assign(vecs, K, ITERS)
    return assign.select("vec_id", "cid", F.col("d").cast("long").alias("dist_sq"))
