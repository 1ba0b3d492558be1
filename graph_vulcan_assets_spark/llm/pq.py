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

Scale shape (round 12, the packed plan — see llm/kmeans.py): vectors
stay packed as one (vec_id, qarr) row, materialized once and reused by
all 4 subspaces × iterations; the M·K-row codebook collapses to a single
broadcast array row and every vector computes all 4 subspace argmins
inside ONE projection (slice + zip_with/aggregate squared distances,
array_min tie-break on the lowest code) — no n·d·K join intermediate, no
per-vector argmin shuffle. Only the codebook UPDATE shuffles (posexplode
+ partial aggregation to ≤ M·K·SUB_DIM rows per task). Training normally
runs on a small SAMPLE at 100 TB — the full-corpus pass here doubles as
the assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.llm.embeddings import finite_sql
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


def _quantized_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed (vec_id, qarr) integer-micro vectors, checkpointed once —
    the single materialization every PQ stage derives from."""
    from graph_vulcan_assets_spark.llm.kmeans import quantize_vectors

    return quantize_vectors(load_table(spark, sf_dir, "embeddings"))


def _quantized_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded (vec_id, pos, q) VIEW over :func:`_quantized_packed` —
    a map-only posexplode of the packed checkpoint (no second
    materialization); kept for the stages that genuinely want the melted
    form (IVF coarse scoring, per-pos LUT joins)."""
    return _exploded(_quantized_packed(spark, sf_dir))


def _exploded(packed: DataFrame) -> DataFrame:
    return packed.select("vec_id", F.posexplode("qarr").alias("pos", "q")).select(
        "vec_id", F.col("pos").cast("long").alias("pos"), "q"
    )


def _np_pq_assign(packed: DataFrame, books: list[list[tuple[int, list[int]]]]):
    """Map-only PQ assignment: per Arrow batch, one numpy pass computes
    every subspace's argmin code (same mechanism and exactness contract
    as kmeans.np_assign — exact int64 distances, first-min == lowest cid
    because each sub's codebook is cid-sorted). ``books[s]`` is the
    cid-sorted [(cid, 16 components)] codebook of subspace s; a cluster
    that received no vectors on the previous update drops out of its
    sub's candidate set, exactly as it dropped out of the old join.
    Output: (vec_id, qarr, cids array, ds array) indexed by sub."""
    import numpy as np

    # all-or-none emptiness (ADVICE r12): subspace codebooks only empty
    # together (seeds/updates vanish per vector, never per sub) — a
    # future per-sub collapse path must fail loudly, not drop all rows
    assert all(books) or not any(books), "per-sub codebook emptiness diverged"
    if any(not b for b in books):
        # degenerate input (empty table ⇒ empty codebooks — seeds and
        # updates vanish together): the old broadcast join produced no
        # assignment rows; mirror that
        return packed.select(
            "vec_id",
            "qarr",
            F.lit(None).cast("array<bigint>").alias("cids"),
            F.lit(None).cast("array<bigint>").alias("ds"),
        ).where(F.lit(False))
    subs = []
    for s in range(M):
        cids = np.array([c for c, _ in books[s]], dtype=np.int64)
        cmat = np.array([arr for _, arr in books[s]], dtype=np.int64)
        subs.append((cids, cmat, (cmat * cmat).sum(axis=1)))

    def fn(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            qlist = b.column("qarr")
            q = np.asarray(qlist.flatten(), dtype=np.int64)
            # inline guard (see kmeans kernel-author note: module-level
            # helpers pickle by reference and break under the file-path
            # driver import)
            assert qlist.null_count == 0 and q.size == b.num_rows * M * SUB_DIM, (
                f"packed vectors violated the finite gate: {qlist.null_count}"
                f" nulls, {q.size} values for {b.num_rows} rows x {M * SUB_DIM} dims"
            )
            q = q.reshape(b.num_rows, M * SUB_DIM)
            n = b.num_rows
            cid_cols, d_cols = [], []
            for s, (cids, cmat, cnorm) in enumerate(subs):
                qs = q[:, s * SUB_DIM : (s + 1) * SUB_DIM]
                dist = (
                    (qs * qs).sum(axis=1)[:, None] + cnorm[None, :] - 2 * (qs @ cmat.T)
                )
                idx = dist.argmin(axis=1)
                cid_cols.append(cids[idx])
                d_cols.append(dist[np.arange(n), idx])
            offsets = pa.array(np.arange(0, (n + 1) * M, M, dtype=np.int32))
            cids_arr = pa.ListArray.from_arrays(
                offsets, pa.array(np.stack(cid_cols, axis=1).ravel(), type=pa.int64())
            )
            ds_arr = pa.ListArray.from_arrays(
                offsets, pa.array(np.stack(d_cols, axis=1).ravel(), type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("vec_id"), qlist, cids_arr, ds_arr],
                names=["vec_id", "qarr", "cids", "ds"],
            )

    return packed.select("vec_id", "qarr").mapInArrow(
        fn, "vec_id long, qarr array<bigint>, cids array<bigint>, ds array<bigint>"
    )


def _np_pq_update(packed, books):
    """One fused PQ Lloyd step over all M subspaces: assignment + per-
    (sub, cid) component sums in a SINGLE map-only pass (the same
    treeAggregate shape as kmeans.np_update, and the same exactness
    argument — integer partials reduced with Python ints, truncated mean
    via kmeans.trunc_mean). Replaces the per-iteration posexplode +
    hash-aggregate update job; each task emits ≤ M·K partial rows."""
    import numpy as np

    from graph_vulcan_assets_spark.llm.kmeans import trunc_mean

    subs = []
    for s in range(M):
        cids = np.array([c for c, _ in books[s]], dtype=np.int64)
        cmat = np.array([arr for _, arr in books[s]], dtype=np.int64)
        subs.append((cids, cmat, (cmat * cmat).sum(axis=1)))

    def fn(batches):
        import pyarrow as pa

        sums = [np.zeros(c[1].shape, dtype=np.int64) for c in subs]
        cnts = [np.zeros(len(c[0]), dtype=np.int64) for c in subs]
        for b in batches:
            if b.num_rows == 0:
                continue
            qlist = b.column("qarr")
            q = np.asarray(qlist.flatten(), dtype=np.int64)
            # inline guard (see kmeans kernel-author note)
            assert qlist.null_count == 0 and q.size == b.num_rows * M * SUB_DIM, (
                f"packed vectors violated the finite gate: {qlist.null_count}"
                f" nulls, {q.size} values for {b.num_rows} rows x {M * SUB_DIM} dims"
            )
            q = q.reshape(b.num_rows, M * SUB_DIM)
            for s, (cids, cmat, cnorm) in enumerate(subs):
                qs = q[:, s * SUB_DIM : (s + 1) * SUB_DIM]
                dist = (
                    (qs * qs).sum(axis=1)[:, None] + cnorm[None, :] - 2 * (qs @ cmat.T)
                )
                idx = dist.argmin(axis=1)
                for j in np.unique(idx):
                    sums[s][j] += qs[idx == j].sum(axis=0)
                cnts[s] += np.bincount(idx, minlength=len(cids))
        out_sub, out_cid, out_s, out_n = [], [], [], []
        for s, (cids, _, _) in enumerate(subs):
            for j in np.flatnonzero(cnts[s]):
                out_sub.append(s)
                out_cid.append(int(cids[j]))
                out_s.append([int(x) for x in sums[s][j]])
                out_n.append(int(cnts[s][j]))
        if not out_sub:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_sub, type=pa.int32()),
                pa.array(out_cid, type=pa.int64()),
                pa.array(out_s, type=pa.list_(pa.int64())),
                pa.array(out_n, type=pa.int64()),
            ],
            names=["sub", "cid", "s", "n"],
        )

    rows = (
        packed.select("qarr")
        .mapInArrow(fn, "sub int, cid long, s array<bigint>, n long")
        .collect()
    )
    agg: dict[tuple[int, int], tuple[list[int], int]] = {}
    for r in rows:
        key = (r["sub"], r["cid"])
        prev = agg.get(key)
        if prev is None:
            agg[key] = ([int(x) for x in r["s"]], int(r["n"]))
        else:
            sv, n = prev
            agg[key] = ([x + int(y) for x, y in zip(sv, r["s"])], n + int(r["n"]))
    return [
        sorted(
            (cid, [trunc_mean(x, n) for x in sv])
            for (s2, cid), (sv, n) in agg.items()
            if s2 == s
        )
        for s in range(M)
    ]


def _train_all_packed(packed):
    """(packed assignment, melted codebooks, driver books, seed vectors)
    for ALL subspaces in ONE fused dataflow over PACKED vectors: every
    iteration's assignment is one vectorized numpy map
    (:func:`_np_pq_assign`) against driver-held codebooks (M·K·SUB_DIM
    integers — bounded like kmeans' centroid matrix), and each update
    iteration is ONE fused map-only job (:func:`_np_pq_update`). The
    seed collect doubles as the materialization of the lazy quantize
    checkpoint. The assignment comes back as (vec_id, qarr, cids, ds)
    with the per-sub argmin arrays indexed by sub; :func:`_train_all`
    melts it for callers that join per-(sub, cid). Bit-identical to the
    original exploded plan (integer arithmetic, identical tie-breaks).
    ``seed`` (the driver-held first-K quantized vectors) rides along so
    ADC scorers can build their query LUTs without another job."""
    spark = packed.sparkSession
    seed = {
        r["vec_id"]: [int(x) for x in r["qarr"]]
        for r in packed.where(F.col("vec_id") < K).collect()
    }
    books = [
        [(cid, seed[cid][s * SUB_DIM : (s + 1) * SUB_DIM]) for cid in sorted(seed)]
        for s in range(M)
    ]

    for _ in range(ITERS - 1):
        if any(not b for b in books):
            break  # degenerate input: no seeds ⇒ empty assignment below
        books = _np_pq_update(packed, books)
    assigned = _np_pq_assign(packed, books)
    # the melted (sub, cid, pos, c) codebook callers join LUTs against —
    # rebuilt from the driver-held final books (tiny: M·K·SUB_DIM rows)
    cent = spark.createDataFrame(
        [
            (s, cid, s * SUB_DIM + rel, c)
            for s in range(M)
            for cid, comps in books[s]
            for rel, c in enumerate(comps)
        ],
        schema="sub int, cid long, pos long, c long",
    )
    return assigned, cent, books, seed


def _train_all(packed):
    """Melted view of :func:`_train_all_packed`: (vec_id, sub, cid, d)
    assignment rows + the melted (sub, cid, pos, c) codebooks."""
    assigned, cent, _books, _seed = _train_all_packed(packed)
    melt = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub"),
                F.get("cids", s).alias("cid"),
                F.get("ds", s).alias("d"),
            )
            for s in range(M)
        ]
    )
    assign = assigned.select("vec_id", F.explode(melt).alias("b")).select(
        "vec_id",
        F.col("b.sub").alias("sub"),
        F.col("b.cid").alias("cid"),
        F.col("b.d").alias("d"),
    )
    return assign, cent


@query("q_pq_codes", oracle=_pq_oracle())
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode the embeddings table: 4 subspace codebooks (k=16, 2 Lloyd
    iterations, seeded from the first k vectors' subvectors), emitting
    each vector's 4 codes and exact total squared quantization error.

    The packed plan makes this MAP-ONLY after training: each row already
    carries its per-sub argmin arrays, so codes and dist_sq project out
    without the old melted groupBy(vec_id) pivot shuffle."""
    assigned, _cent, _books, _seed = _train_all_packed(_quantized_packed(spark, sf_dir))
    dist_sq = F.get("ds", 0)
    for s in range(1, M):
        dist_sq = dist_sq + F.get("ds", s)
    return assigned.select(
        "vec_id",
        *[F.get("cids", s).alias(f"code{s}") for s in range(M)],
        dist_sq.cast("long").alias("dist_sq"),
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

    Scale shape (round 13): the M×K LUT is computed ON THE DRIVER from
    the driver-held final codebooks and the driver-held query vector
    (vector 0 is among the first-K seed rows the training already
    collects — no extra job) and inlined as literal arrays, so scoring
    is a PURE PROJECTION over the packed assignment — 4 array lookups
    summed per row, no LUT join, no groupBy — and the top-10 compiles
    to TakeOrderedAndProject. Exact: the LUT entries are
    arbitrary-precision Python-int Σ(q−c)², the same integers the old
    broadcast-join aggregate produced; ranking (vec_id tie-break) is
    engine-identical.
    """
    packed = _quantized_packed(spark, sf_dir)
    assigned, _cent, books, seed = _train_all_packed(packed)
    q0 = seed.get(0)
    if q0 is None:
        # vector 0 absent (finite-gated away / empty table): the oracle's
        # per-sub LUT CTEs are empty, so the scored set is empty
        return assigned.select(
            "vec_id", F.lit(None).cast("long").alias("adc_dist")
        ).where(F.lit(False))
    adc = None
    for s in range(M):
        qsub = q0[s * SUB_DIM : (s + 1) * SUB_DIM]
        lut = {
            cid: sum((qv - cv) * (qv - cv) for qv, cv in zip(qsub, comps))
            for cid, comps in books[s]
        }
        # a MAP literal keyed by the actual cid — cids are seed VEC_IDS,
        # which hostile inputs make sparse or negative, so positional
        # array indexing would silently yield NULL (probe_extreme caught
        # exactly that); every assigned cid is a books key (argmin over
        # these books), so the lookup never misses
        m = F.create_map(
            *[
                x
                for cid, d in lut.items()
                for x in (F.lit(int(cid)).cast("long"), F.lit(int(d)).cast("long"))
            ]
        )
        term = F.element_at(m, F.get("cids", s))
        adc = term if adc is None else adc + term
    return (
        assigned.select("vec_id", adc.cast("long").alias("adc_dist"))
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
    packed = _quantized_packed(spark, sf_dir)
    vecs = _exploded(packed)
    assigned_packed, _cent_all, books, seed = _train_all_packed(packed)

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

    # ---- stage 2: ADC over the PQ codes (round 13: the per-query LUTs
    # are driver-computed from the driver-held books + seed query vectors
    # — the queries are vec_id < 10 < K, already in the seed collect —
    # and inlined as literal (qid × cid) arrays, so scoring is a pure
    # projection after the candidate join: no melt, no LUT join, no
    # groupBy; integer-exact like q_pq_adc_topk)
    # query LUTs keyed by the ACTUAL ids (nested map literals — ids can be
    # sparse or negative on hostile inputs, so positional array indexing
    # would silently NULL; see q_pq_adc_topk). Query vectors are the
    # vec_id < 10 rows, all inside the first-K seed collect.
    qids_present = sorted(v for v in seed if v < 10)
    if not qids_present or any(not b for b in books):
        # degenerate: no surviving query vectors / empty codebooks ⇒ the
        # candidate set is empty too; a typed NULL keeps the plan valid
        qids_present = []
    adc_dist = F.lit(None).cast("long") if not qids_present else None
    for s in range(M if qids_present else 0):
        pairs = []
        for qid in qids_present:
            qsub = seed[qid][s * SUB_DIM : (s + 1) * SUB_DIM]
            lut = {
                cid: sum((qv - cv) * (qv - cv) for qv, cv in zip(qsub, comps))
                for cid, comps in books[s]
            }
            inner = F.create_map(
                *[
                    x
                    for cid, d in lut.items()
                    for x in (F.lit(int(cid)).cast("long"), F.lit(int(d)).cast("long"))
                ]
            )
            pairs.extend((F.lit(int(qid)).cast("long"), inner))
        term = F.element_at(
            F.element_at(F.create_map(*pairs), F.col("qid")), F.get("cids", s)
        )
        adc_dist = term if adc_dist is None else adc_dist + term
    adc = candidates.join(assigned_packed.select("vec_id", "cids"), "vec_id").select(
        "qid", "vec_id", adc_dist.alias("adc_dist")
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
