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
from graph_vulcan_assets_spark.llm.embeddings import finite_embeddings, finite_sql
from graph_vulcan_assets_spark.tables import load_table

M = 4  # subspaces
SUB_DIM = 16  # dims per subspace (embeddings are 64-dim)
K = 16  # codes per subspace
ITERS = 2
_SCALE = 1_000_000


def _pq_oracle() -> str:
    """Unrolled per-subspace Lloyd chains (the llm/kmeans.py oracle
    pattern ×M), pivoted to one row per vector."""
    sql = f"""
    WITH vecs AS (
      SELECT vec_id,
             unnest(range(len(embedding))) AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
      FROM embeddings WHERE {finite_sql("embedding")})"""
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
    emb = finite_embeddings(load_table(spark, sf_dir, "embeddings"))
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "e"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("e").cast("double") * _SCALE, 0).cast("long").alias("q"),
        )
        .localCheckpoint(eager=True)
    )


def _train_all(vecs):
    """(melted assignment, melted codebooks) for ALL subspaces in ONE
    fused dataflow: subspace id is a key column (sub = pos div SUB_DIM),
    so each Lloyd iteration is a single broadcast join + window + update
    covering every subspace — 4x fewer jobs than looping subspaces, same
    per-subspace independence (sub participates in every key)."""
    v = vecs.withColumn("sub", F.floor(F.col("pos") / SUB_DIM).cast("int"))
    cent = v.where(F.col("vec_id") < K).select(
        "sub", F.col("vec_id").alias("cid"), "pos", F.col("q").alias("c")
    )
    assign = None
    for i in range(ITERS):
        d = (
            v.join(F.broadcast(cent), ["sub", "pos"])
            .groupBy("vec_id", "sub", "cid")
            .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d"))
        )
        w = Window.partitionBy("vec_id", "sub").orderBy("d", "cid")
        assign = (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "sub", "cid", "d")
        )
        if i < ITERS - 1:
            cent = (
                assign.join(v, ["vec_id", "sub"])
                .groupBy("sub", "cid", "pos")
                .agg(
                    ((F.sum("q") - F.sum("q") % F.count("*")) / F.count("*"))
                    .cast("long")
                    .alias("c")
                )
                .localCheckpoint(eager=True)
            )
    return assign, cent


@query("q_pq_codes", oracle=_pq_oracle())
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode the embeddings table: 4 subspace codebooks (k=16, 2 Lloyd
    iterations, seeded from the first k vectors' subvectors), emitting
    each vector's 4 codes and exact total squared quantization error."""
    assign, _cent = _train_all(_quantized_vecs(spark, sf_dir))
    codes = [
        F.max(F.when(F.col("sub") == s, F.col("cid"))).alias(f"code{s}")
        for s in range(M)
    ]
    return assign.groupBy("vec_id").agg(
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
    vecs = _quantized_vecs(spark, sf_dir)
    assign, cent = _train_all(vecs)
    qv = vecs.where(F.col("vec_id") == 0).select(
        F.floor(F.col("pos") / SUB_DIM).cast("int").alias("sub"), "pos", "q"
    )
    lut = (
        qv.join(F.broadcast(cent), ["sub", "pos"])
        .groupBy("sub", "cid")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d"))
    )
    return (
        assign.select("vec_id", "sub", "cid")
        .join(F.broadcast(lut), ["sub", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


@query("q_sim_ivfpq")  # rows-only: sample-seeded index; recall-tested
def q_sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ two-stage ANN (X3, the billion-vector production recipe):
    coarse inverted-file pruning -> ADC scoring over PQ codes -> exact
    re-rank of the short list.

    1. coarse: deterministic 1-in-25 sample centroids; every vector is
       assigned to its nearest cell by exact integer L2 (broadcast
       centroids, one linear pass); queries probe their 3 nearest cells —
       an equi-join on cell id replaces the all-pairs scan.
    2. ADC: candidates score as M=4 one-byte-code lookups against the
       query's 64-entry LUT (broadcast) — no per-candidate float math.
    3. exact: the ADC top-20 per query re-ranks by true integer L2 on the
       raw vectors, emitting the final top-5.

    At 100 TB: stage 1 touches ~nprobe/k of the corpus, stage 2 reads
    4 bytes per candidate instead of 256, stage 3 reads full vectors for
    only ~20 rows per query. Recall vs exact L2 top-5 is the correctness
    story (tests/test_ann_recall.py); every arithmetic step is integer,
    so results are deterministic across runs and engines.
    """
    nprobe, shortlist, topk = 3, 20, 5
    vecs = _quantized_vecs(spark, sf_dir)
    assign_all, cent_all = _train_all(vecs)

    # ---- stage 1: coarse cells (integer L2 against sampled centroids)
    cents = vecs.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("cell"), "pos", F.col("q").alias("c")
    )
    d2 = F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d2")

    def nearest_cells(src: DataFrame, k: int) -> DataFrame:
        scored = src.join(F.broadcast(cents), "pos").groupBy("vec_id", "cell").agg(d2)
        w = Window.partitionBy("vec_id").orderBy("d2", "cell")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("vec_id", "cell")
        )

    assigned = nearest_cells(vecs, 1)
    qids = vecs.where(F.col("vec_id") < 10)
    probes = nearest_cells(qids, nprobe).select(
        F.col("vec_id").alias("qid"), "cell"
    )
    # (qid, vec_id) pairs are unique by construction — each vec_id maps to
    # exactly ONE cell (nearest_cells k=1) and a qid probes nprobe DISTINCT
    # cells, so the equi-join emits each pair at most once; a .distinct()
    # here would add a full shuffle over the largest intermediate for
    # nothing
    candidates = (
        probes.join(assigned, "cell")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )

    # ---- stage 2: ADC over the PQ codes
    qv = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.floor(F.col("pos") / SUB_DIM).cast("int").alias("sub"),
        "pos",
        "q",
    )
    lut = (
        qv.join(F.broadcast(cent_all), ["sub", "pos"])
        .groupBy("qid", "sub", "cid")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d"))
    )
    adc = (
        candidates.join(assign_all.select("vec_id", "sub", "cid"), "vec_id")
        .join(F.broadcast(lut), ["qid", "sub", "cid"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", "vec_id")
    short = (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= shortlist)
        .select("qid", "vec_id")
    )

    # ---- stage 3: exact integer-L2 re-rank of the shortlist
    qfull = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "pos", F.col("q").alias("qq")
    )
    exact = (
        short.join(vecs, "vec_id")
        .join(qfull, ["qid", "pos"])
        .groupBy("qid", "vec_id")
        .agg(
            F.sum((F.col("q") - F.col("qq")) * (F.col("q") - F.col("qq"))).alias("l2")
        )
    )
    w2 = Window.partitionBy("qid").orderBy("l2", "vec_id")
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= topk)
        .select("qid", F.col("vec_id").alias("nid"), F.col("l2").cast("long").alias("l2_dist"))
    )
