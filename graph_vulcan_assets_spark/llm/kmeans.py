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
arithmetic is defined everywhere. Assignment is MAP-ONLY and vectorized:
one numpy matmul per Arrow batch (``mapInArrow``) against a driver-held
k·d centroid matrix (:func:`np_assign`) — no n·d·k join intermediate, no
per-vector shuffle, no window sort, and no interpreted per-element
lambda (the zip_with/aggregate projection form was measured slower than
the old exploded join; the batch matmul is the guide-§4.2 answer). Only
the centroid UPDATE shuffles: posexplode of the assigned vectors
partially aggregates map-side to ≤ k·d rows per task, and its k·d result
returns to the driver as the next iteration's matrix — the same bounded
per-iteration artifact MLlib's KMeans collects.
(The previous exploded plan — (vec_id, pos, q) joined with broadcast
centroids ON pos — materialized n·d·k rows per iteration and sorted n·k
rows per argmin window. The DuckDB oracle keeps the exploded CTE form;
integer arithmetic makes all three groupings bit-identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
        # LAZY checkpoint (round 13): the first consumer job — always the
        # seed-centroid collect, which scans every partition — materializes
        # it, saving the separate eager materialization job per query
        .localCheckpoint(eager=False)
    )


# Kernel-author note (round 13, caught by driver_sim): the Arrow kernels
# below inline their batch→matrix guard instead of sharing a module-level
# helper. A module-level function referenced from a mapInArrow closure is
# pickled BY REFERENCE, and the driver contract imports this package by
# FILE PATH — so executors (whose sys.path lacks the repo when the driver
# runs from another cwd) cannot import it and every kernel task dies.
# The guard itself is the ADVICE-r12 defense: a NULL or wrong-length qarr
# would silently misalign every subsequent row of the batch and corrupt
# assignments; fail loudly instead.


def trunc_mean(s: int, n: int) -> int:
    """Exact ``(s - s % n) / n`` with TRUNCATED ``%`` (the Spark/DuckDB
    semantics both oracles use) over arbitrary-precision Python ints —
    i.e. integer division truncating toward zero; Python's ``//`` floors,
    so negative sums need the sign split."""
    q = abs(s) // n
    return q if s >= 0 else -q


def np_assign(vecs: DataFrame, cent: list[tuple[int, list[int]]]) -> DataFrame:
    """Map-only nearest-centroid assignment: one vectorized numpy pass per
    Arrow batch (``mapInArrow``) against a driver-held centroid matrix.

    ``cent`` is [(cid, components)] SORTED by cid — numpy's first-minimum
    ``argmin`` then reproduces the oracle's ``ORDER BY d, cid`` tie-break
    exactly. Distances are exact int64 (|q|² + |c|² − 2q·c == Σ(q−c)² in
    integer arithmetic; magnitudes bounded far under int64 by the
    EMBED_BOUND gate). Returns (vec_id, cid, d, qarr) with the input
    vector passed through untouched for downstream stages (the update
    aggregate, SemDeDup's pair kernel).

    Guide-§4.2 rationale, measured at sf0.1: the same math as a
    zip_with/aggregate projection runs interpreted per array element in
    the JVM; as a batch matmul it is one native pass. The centroid matrix
    is k·d values — driver-bounded by the same discipline as the BPE
    merge list (MLlib's KMeans collects exactly this per iteration).
    """
    import numpy as np

    if not cent:
        # degenerate input (empty table ⇒ no seed vectors): the old
        # broadcast join produced no assignment rows; mirror that
        return vecs.select(
            "vec_id",
            F.lit(None).cast("long").alias("cid"),
            F.lit(None).cast("long").alias("d"),
            "qarr",
        ).where(F.lit(False))
    cids = np.array([c for c, _ in cent], dtype=np.int64)
    cmat = np.array([arr for _, arr in cent], dtype=np.int64)
    cnorm = (cmat * cmat).sum(axis=1)

    d = cmat.shape[1]

    def fn(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            qlist = b.column("qarr")
            q = np.asarray(qlist.flatten(), dtype=np.int64)
            assert qlist.null_count == 0 and q.size == b.num_rows * d, (
                f"packed vectors violated the finite gate: {qlist.null_count}"
                f" nulls, {q.size} values for {b.num_rows} rows x {d} dims"
            )
            q = q.reshape(b.num_rows, d)
            dist = (q * q).sum(axis=1)[:, None] + cnorm[None, :] - 2 * (q @ cmat.T)
            idx = dist.argmin(axis=1)  # first min = lowest cid (cent sorted)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("vec_id"),
                    pa.array(cids[idx], type=pa.int64()),
                    pa.array(dist[np.arange(len(idx)), idx], type=pa.int64()),
                    qlist,
                ],
                names=["vec_id", "cid", "d", "qarr"],
            )

    return vecs.select("vec_id", "qarr").mapInArrow(
        fn, "vec_id long, cid long, d long, qarr array<bigint>"
    )


def collect_centroids(df: DataFrame) -> list[tuple[int, list[int]]]:
    """(cid, carr) rows → cid-sorted [(cid, components)] on the driver.
    Bounded: k·d integers."""
    return sorted((r["cid"], list(r["carr"])) for r in df.collect())


def np_update(
    vecs: DataFrame, cent: list[tuple[int, list[int]]]
) -> list[tuple[int, list[int]]]:
    """One fused Lloyd step: assignment + per-cluster component sums in a
    SINGLE map-only pass (the treeAggregate shape MLlib's KMeans uses).

    Each task emits at most k partial rows ``(cid, component sums,
    count)``; the driver reduces the partials with arbitrary-precision
    Python ints and applies the truncated integer mean. Bit-identical to
    the previous posexplode + two-level groupBy update: integer sums are
    association-order-independent, and :func:`trunc_mean` reproduces
    ``(sum - sum % cnt) / cnt`` under Spark/DuckDB's truncated ``%``.
    Replaces, per iteration, a separate assignment recompute feeding an
    n·d-row explode through a two-exchange hash aggregate with one
    exchange-free job; the collected partials are ≤ tasks · k·(d+2)
    values (the same boundedness class as the k·d centroid collect —
    at extreme task counts swap the driver reduce for a two-level
    groupBy(cid) over these same partial rows). Clusters that receive no
    vectors drop out, exactly as they dropped out of the old groupBy."""
    import numpy as np

    cids = np.array([c for c, _ in cent], dtype=np.int64)
    cmat = np.array([arr for _, arr in cent], dtype=np.int64)
    cnorm = (cmat * cmat).sum(axis=1)
    k, d = cmat.shape

    def fn(batches):
        import pyarrow as pa

        sums = np.zeros((k, d), dtype=np.int64)
        cnts = np.zeros(k, dtype=np.int64)
        for b in batches:
            if b.num_rows == 0:
                continue
            qlist = b.column("qarr")
            q = np.asarray(qlist.flatten(), dtype=np.int64)
            assert qlist.null_count == 0 and q.size == b.num_rows * d, (
                f"packed vectors violated the finite gate: {qlist.null_count}"
                f" nulls, {q.size} values for {b.num_rows} rows x {d} dims"
            )
            q = q.reshape(b.num_rows, d)
            dist = (q * q).sum(axis=1)[:, None] + cnorm[None, :] - 2 * (q @ cmat.T)
            idx = dist.argmin(axis=1)
            for j in np.unique(idx):
                sums[j] += q[idx == j].sum(axis=0)
            cnts += np.bincount(idx, minlength=k)
        nz = np.flatnonzero(cnts)
        if nz.size == 0:
            return
        offsets = pa.array(np.arange(0, (nz.size + 1) * d, d, dtype=np.int32))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cids[nz], type=pa.int64()),
                pa.ListArray.from_arrays(
                    offsets, pa.array(sums[nz].ravel(), type=pa.int64())
                ),
                pa.array(cnts[nz], type=pa.int64()),
            ],
            names=["cid", "s", "n"],
        )

    rows = (
        vecs.select("qarr")
        .mapInArrow(fn, "cid long, s array<bigint>, n long")
        .collect()
    )
    agg: dict[int, tuple[list[int], int]] = {}
    for r in rows:
        prev = agg.get(r["cid"])
        if prev is None:
            agg[r["cid"]] = ([int(x) for x in r["s"]], int(r["n"]))
        else:
            s, n = prev
            agg[r["cid"]] = (
                [x + int(y) for x, y in zip(s, r["s"])],
                n + int(r["n"]),
            )
    return sorted(
        (cid, [trunc_mean(x, n) for x in s]) for cid, (s, n) in agg.items()
    )


def lloyd_assign(vecs: DataFrame, k: int = K, iters: int = ITERS) -> DataFrame:
    """Fixed-point Lloyd over packed (vec_id, qarr) — the Spark twin of
    :func:`lloyd_ctes`; returns (vec_id, cid, d, qarr). See module
    docstring for the exactness contract and the packed plan shape.

    Round-13 shape: the seed collect doubles as the materialization of
    the lazy quantize checkpoint; each update iteration is ONE fused
    map-only job (:func:`np_update` — assignment and partial sums in the
    same numpy pass, no posexplode, no exchange); the final assignment
    job is a single exchange-free map stage.
    """
    cent = collect_centroids(
        vecs.where(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cid"), F.col("qarr").alias("carr")
        )
    )
    for _ in range(iters - 1):
        if not cent:
            break  # degenerate input: no seed vectors ⇒ empty assignment
        cent = np_update(vecs, cent)
    return np_assign(vecs, cent)


@query("q_kmeans_assign", oracle=_kmeans_oracle())
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 fixed-point Lloyd k-means, 3 iterations, seeded from the first
    k vectors; returns every vector's final (cluster, exact squared
    distance). See module docstring for the exactness contract."""
    vecs = quantize_vectors(load_table(spark, sf_dir, "embeddings"))
    assign = lloyd_assign(vecs, K, ITERS)
    return assign.select("vec_id", "cid", F.col("d").cast("long").alias("dist_sq"))
