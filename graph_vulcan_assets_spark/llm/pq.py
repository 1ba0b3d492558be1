"""Product quantization (PQ) for embedding compression — the memory/IO
workhorse of billion-vector ANN (IVF-PQ): a 64-dim float vector becomes
M=4 one-byte codes (64× smaller), searchable via per-subspace lookup
tables.

The reference has no vector surface; this extends llm/similarity.py's
IVF/LSH indexes with the compression stage a 100 TB embedding corpus
needs. Deterministic and oracle-checked with the same integer-exactness
contract as llm/kmeans.py (components quantize to integer micros,
distances are BIGINT sums, centroid updates are truncated integer means,
argmin ties break on the lowest code) — so Spark and DuckDB agree
bit-for-bit despite 4 independent codebook trainings.

Scale shape: subvectors come from ONE posexplode of the embedding
(materialized once, reused by all 4 subspaces × iterations); each Lloyd
step is a broadcast join against a 16·16-row codebook + a partial
aggregate; code assignment pivots 4 subspace argmins back to one row per
vector with a single groupBy(vec_id). Training normally runs on a small
SAMPLE at 100 TB — the full-corpus pass here doubles as the assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

M = 4  # subspaces
SUB_DIM = 16  # dims per subspace (embeddings are 64-dim)
K = 16  # codes per subspace
ITERS = 2
_SCALE = 1_000_000


def _pq_oracle() -> str:
    """Unrolled per-subspace Lloyd chains (the llm/kmeans.py oracle
    pattern ×M), pivoted to one row per vector."""
    sql = """
    WITH vecs AS (
      SELECT vec_id,
             unnest(range(len(embedding))) AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
      FROM embeddings)"""
    for s in range(M):
        lo, hi = s * SUB_DIM, (s + 1) * SUB_DIM
        sql += f""",
    v{s} AS (SELECT vec_id, pos, q FROM vecs WHERE pos >= {lo} AND pos < {hi}),
    c{s}_0 AS (SELECT vec_id AS cid, pos, q AS c FROM v{s} WHERE vec_id < {K})"""
        for i in range(1, ITERS + 1):
            sql += f""",
    d{s}_{i} AS (SELECT v.vec_id, c.cid, sum((v.q - c.c) * (v.q - c.c)) AS d
                 FROM v{s} v JOIN c{s}_{i - 1} c ON v.pos = c.pos
                 GROUP BY v.vec_id, c.cid),
    a{s}_{i} AS (SELECT vec_id, cid, CAST(d AS BIGINT) AS d FROM (
                   SELECT vec_id, cid, d,
                          row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                   FROM d{s}_{i}) WHERE rn = 1),
    c{s}_{i} AS (SELECT a.cid, v.pos,
                        CAST((sum(v.q) - (sum(v.q) % count(*))) / count(*) AS BIGINT) AS c
                 FROM a{s}_{i} a JOIN v{s} v ON v.vec_id = a.vec_id
                 GROUP BY a.cid, v.pos)"""
    finals = ", ".join(
        f"max(CASE WHEN sub = {s} THEN cid END) AS code{s}" for s in range(M)
    )
    unions = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS sub, cid, d FROM a{s}_{ITERS}" for s in range(M)
    )
    sql += f""",
    allsub AS ({unions})
    SELECT vec_id, {finals},
           CAST(sum(d) AS BIGINT) AS dist_sq
    FROM allsub GROUP BY vec_id"""
    return sql


def _quantized_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "e"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("e").cast("double") * _SCALE, 0).cast("long").alias("q"),
        )
        .localCheckpoint(eager=True)
    )


def _train_subspace(v: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(final assignment, final codebook) for one subspace — the
    llm/kmeans.py loop with the centroid-side lineage checkpoint."""
    cent = v.where(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), "pos", F.col("q").alias("c")
    )
    assign = None
    for i in range(ITERS):
        d = (
            v.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d"))
        )
        w = Window.partitionBy("vec_id").orderBy("d", "cid")
        assign = (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "d")
        )
        if i < ITERS - 1:
            cent = (
                assign.join(v, "vec_id")
                .groupBy("cid", "pos")
                .agg(
                    ((F.sum("q") - F.sum("q") % F.count("*")) / F.count("*"))
                    .cast("long")
                    .alias("c")
                )
                .localCheckpoint(eager=True)
            )
    return assign, cent


def _per_subspace(spark: SparkSession, sf_dir: str):
    vecs = _quantized_vecs(spark, sf_dir)
    out = []
    for s in range(M):
        v = vecs.where(
            (F.col("pos") >= s * SUB_DIM) & (F.col("pos") < (s + 1) * SUB_DIM)
        )
        assign, cent = _train_subspace(v)
        out.append((s, v, assign, cent))
    return out


@query("q_pq_codes", oracle=_pq_oracle())
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode the embeddings table: 4 subspace codebooks (k=16, 2 Lloyd
    iterations, seeded from the first k vectors' subvectors), emitting
    each vector's 4 codes and exact total squared quantization error."""
    per_sub = [
        assign.select("vec_id", F.lit(s).alias("sub"), "cid", "d")
        for s, _v, assign, _c in _per_subspace(spark, sf_dir)
    ]
    allsub = per_sub[0]
    for p in per_sub[1:]:
        allsub = allsub.unionByName(p)
    codes = [
        F.max(F.when(F.col("sub") == s, F.col("cid"))).alias(f"code{s}")
        for s in range(M)
    ]
    return allsub.groupBy("vec_id").agg(
        *codes, F.sum("d").cast("long").alias("dist_sq")
    )


def _adc_oracle() -> str:
    """PQ chains + per-subspace query lookup tables + approximate top-k."""
    last = ITERS - 1
    sql = _pq_oracle().rsplit(",\n    allsub AS", 1)[0]
    for s in range(M):
        sql += f""",
    lut{s} AS (SELECT c.cid, sum((v.q - c.c) * (v.q - c.c)) AS d
               FROM (SELECT pos, q FROM v{s} WHERE vec_id = 0) v
               JOIN c{s}_{last} c ON v.pos = c.pos
               GROUP BY c.cid)"""
    unions = " UNION ALL ".join(
        f"SELECT a.vec_id, l.d FROM a{s}_{ITERS} a JOIN lut{s} l ON a.cid = l.cid"
        for s in range(M)
    )
    sql += f""",
    scored AS ({unions})
    SELECT vec_id, CAST(sum(d) AS BIGINT) AS adc_dist
    FROM scored GROUP BY vec_id
    ORDER BY adc_dist, vec_id LIMIT 10"""
    return sql


@query("q_pq_adc_topk", oracle=_adc_oracle())
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-10 search over PQ codes: the query
    (vector 0) precomputes one M×K lookup table of exact subspace
    distances to the FINAL codebooks; every corpus vector's approximate
    distance is then 4 one-byte-code lookups summed — no float math per
    candidate, which is why PQ search scans billions of codes at memory
    bandwidth.

    Scale shape: the LUT is 64 rows, broadcast; scoring is an equi-join
    of the melted (vec_id, sub, code) table against it + a partial-agg
    sum; the top-10 compiles to TakeOrderedAndProject. Integer-exact end
    to end, so the ranking (with vec_id tie-break) is engine-identical.
    """
    subs = _per_subspace(spark, sf_dir)
    scored = None
    for s, v, assign, cent in subs:
        qv = v.where(F.col("vec_id") == 0).select("pos", "q")
        lut = (
            qv.join(F.broadcast(cent), "pos")
            .groupBy("cid")
            .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d"))
        )
        part = assign.select("vec_id", "cid").join(F.broadcast(lut), "cid").select(
            "vec_id", "d"
        )
        scored = part if scored is None else scored.unionByName(part)
    return (
        scored.groupBy("vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )
