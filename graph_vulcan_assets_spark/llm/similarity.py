"""Similarity search (X3): top-k cosine over an embedding column.

Baseline: brute-force cosine against a bounded query set — an equi-free
join that is broadcast-bounded (the query set is small by construction).
Scale path: LSH bucketing (random hyperplane signs) turns the all-pairs
problem into an equi-join on bucket signatures.

All vector math is higher-order built-ins (`aggregate`/`zip_with`) in
double precision — JVM-side, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from graph_vulcan_assets_spark.llm.embeddings import cosine_embeddings, cosine_sql
from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (sequential fold, deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


@query(
    "q_sim_topk",
    oracle=f"""
    WITH dv AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE {cosine_sql("embedding")}),
    q AS (SELECT vec_id AS qid, e AS qe FROM dv WHERE vec_id < 10),
    pairs AS (
      SELECT q.qid, dv.vec_id AS nid,
             list_dot_product(q.qe, dv.e)
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(dv.e, dv.e))) AS cos
      FROM q, dv WHERE dv.vec_id <> q.qid)
    SELECT qid, nid, round(cos, 6) AS cos
    FROM (SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, nid) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (X3): 10 query vectors × all candidates.

    The query side is tiny and broadcast, so the "cross" join is a
    broadcast nested loop over a bounded left side — linear in the corpus,
    which is the right baseline shape at 100 TB (queries ≪ corpus).
    Top-k per query via the W6 window pattern.
    """
    e = cosine_embeddings(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    queries = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = (
        e.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            (
                dot(F.col("qe"), F.col("embedding"))
                / (l2_norm(F.col("qe")) * l2_norm(F.col("embedding")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("qid", "nid", F.round("cos", 6).alias("cos"))
    )


@query("q_sim_ivf")
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (X3 scale path, rows-only): inverted-file index with
    deterministic centroids.

    IVF in three declarative stages, no MLlib and no iterative training:
    1. centroids = a deterministic 1-in-25 sample of the corpus (for a
       trained variant, swap in k-means centers — the dataflow is
       unchanged);
    2. assignment: every vector → nearest centroid (broadcast centroids,
       per-row argmin — linear scan, one pass);
    3. probe: each query searches only vectors assigned to its `nprobe`
       nearest centroids — an equi-join on centroid id instead of an
       all-pairs scan. At 100 TB the assignment is the only full pass;
       probing touches ~nprobe/k of the corpus.
    """
    nprobe = 3
    e = cosine_embeddings(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    centroids = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )

    def with_centroids(src: DataFrame, vec_col: str, k: int, out: str) -> DataFrame:
        """Attach each row's k nearest centroid ids (broadcast argmin)."""
        joined = src.crossJoin(F.broadcast(centroids)).withColumn(
            "__cos",
            dot(F.col(vec_col), F.col("cvec"))
            / (l2_norm(F.col(vec_col)) * l2_norm(F.col("cvec"))),
        )
        w = Window.partitionBy(src.columns[0]).orderBy(
            F.col("__cos").desc(), F.col("cid")
        )
        return (
            joined.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .select(*src.columns, F.col("cid").alias(out))
        )

    assigned = with_centroids(e, "embedding", 1, "cell")
    queries = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    probes = with_centroids(queries, "qe", nprobe, "cell")

    pairs = (
        probes.join(assigned, "cell")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            (
                dot(F.col("qe"), F.col("embedding"))
                / (l2_norm(F.col("qe")) * l2_norm(F.col("embedding")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("qid", "nid", F.round("cos", 6).alias("cos"))
    )


@query("q_sim_lsh_bucketed")
def q_sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (X3 scale path, rows-only).

    Random-hyperplane LSH: each vector's bucket is the sign pattern of its
    projection onto P pseudo-random hyperplanes (hyperplane components are
    derived deterministically from xxhash64(dim, plane) so executors agree
    without broadcasting a model). Candidates = pairs sharing a bucket —
    an equi-join on the signature — then exact cosine re-ranks. At 100 TB
    the all-pairs comparison never materializes.
    """
    planes = 8
    e = cosine_embeddings(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")

    def hyperplane_component(dim_idx: Column, plane: int) -> Column:
        # pmod, NOT %: Spark's % keeps the dividend's sign and xxhash64 is
        # negative half the time, so (h % 1000)/500 - 1 would have mean -1
        # instead of 0 — every projection then shares the correlated term
        # -sum(v), the 8 sign bits collapse toward all-0/all-1 buckets
        # (measured: 92 of 500 vectors in two buckets, ~5x the candidate
        # pairs), and collision probability tracks sign(sum(v)) rather
        # than angular similarity (round-4 fix, test-pinned)
        h = F.pmod(F.xxhash64(dim_idx, F.lit(plane)), F.lit(1000))
        return h.cast("double") / 500.0 - 1.0

    def signature(vec: Column) -> Column:
        projections = [
            F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        F.sequence(F.lit(0), F.size(vec) - 1),
                        lambda i: hyperplane_component(i, p),
                    ),
                    lambda x, h: x.cast("double") * h,
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
            for p in range(planes)
        ]
        return F.concat_ws(
            "", *[F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")) for proj in projections]
        )

    sigs = e.withColumn("bucket", signature(F.col("embedding")))
    a = sigs.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"), "bucket"
    )
    b = sigs.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                dot(F.col("a_vec"), F.col("b_vec"))
                / (l2_norm(F.col("a_vec")) * l2_norm(F.col("b_vec"))),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") > 0.2)
    )


_MRL_HEAD = 16
_MRL_SHORTLIST = 20


@query(
    "q_sim_mrl_rerank",
    oracle=f"""
    WITH dv AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE {cosine_sql("embedding")}
        AND len(list_filter(embedding[1:{_MRL_HEAD}], x -> x <> 0)) > 0),
    q AS (SELECT vec_id AS qid, e AS qe FROM dv WHERE vec_id < 10),
    head AS (
      SELECT q.qid, dv.vec_id AS nid, q.qe, dv.e,
             list_dot_product(q.qe[1:{_MRL_HEAD}], dv.e[1:{_MRL_HEAD}])
               / (sqrt(list_dot_product(q.qe[1:{_MRL_HEAD}], q.qe[1:{_MRL_HEAD}]))
                  * sqrt(list_dot_product(dv.e[1:{_MRL_HEAD}], dv.e[1:{_MRL_HEAD}])))
               AS cos_head
      FROM q, dv WHERE dv.vec_id <> q.qid),
    shortlist AS (
      SELECT qid, nid, qe, e
      FROM (SELECT qid, nid, qe, e,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos_head DESC, nid) AS rn
            FROM head)
      WHERE rn <= {_MRL_SHORTLIST}),
    exact AS (
      SELECT qid, nid,
             list_dot_product(qe, e)
               / (sqrt(list_dot_product(qe, qe))
                  * sqrt(list_dot_product(e, e))) AS cos
      FROM shortlist)
    SELECT qid, nid, round(cos, 6) AS cos
    FROM (SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, nid) AS rn
          FROM exact)
    WHERE rn <= 5
    """,
)
def q_sim_mrl_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage search (X3): rank ALL candidates by the
    16-dim prefix cosine, keep a 20-deep shortlist per query, then
    exactly re-rank the shortlist at full dimension.

    The MRL serving pattern (arXiv:2205.13147 §5): the coarse pass
    touches only the prefix — at d=64 that is 4× less arithmetic and,
    with prefix-sliced storage, 4× less I/O — and full vectors are read
    for just ``shortlist ≪ corpus`` candidates per query. Companion
    metric: q_embed_matryoshka (llm/embeddings.py) measures whether a
    corpus's embeddings retain enough prefix energy for this to be safe;
    tests/test_ann_recall.py measures the recall this trades away on the
    pairwise-random synthetic vectors (a worst case for truncation —
    MRL-trained embeddings concentrate energy in the prefix by design).

    Deterministic: both stages order by (cosine DESC, nid) with cosines
    computed as identical sequential double folds in both engines — the
    same discipline q_sim_topk pins.

    Corrupt-vector contract: the cosine gate (llm/embeddings.py) drops
    NULL/non-finite/zero/wrong-dim vectors, and the MRL coarse pass
    additionally requires a nonzero HEAD prefix — a vector whose head
    slice is all zeros has no coarse direction (its
    head cosine is 0/0, which ANSI refuses; and NULL cosines would sort
    differently in Spark vs DuckDB DESC order). Mirrored in the oracle.
    """
    e = cosine_embeddings(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    e = e.where(
        F.exists(F.slice(F.col("embedding"), 1, _MRL_HEAD), lambda x: x != F.lit(0.0))
    )
    queries = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    qh = F.slice(F.col("qe"), 1, _MRL_HEAD)
    nh = F.slice(F.col("embedding"), 1, _MRL_HEAD)
    head = (
        e.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            "qe",
            F.col("embedding").alias("e"),
            (dot(qh, nh) / (l2_norm(qh) * l2_norm(nh))).alias("cos_head"),
        )
    )
    w1 = Window.partitionBy("qid").orderBy(F.col("cos_head").desc(), F.col("nid"))
    shortlist = (
        head.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= _MRL_SHORTLIST)
        .drop("rn", "cos_head")
    )
    exact = shortlist.select(
        "qid",
        "nid",
        (
            dot(F.col("qe"), F.col("e"))
            / (l2_norm(F.col("qe")) * l2_norm(F.col("e")))
        ).alias("cos"),
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= 5)
        .select("qid", "nid", F.round("cos", 6).alias("cos"))
    )
