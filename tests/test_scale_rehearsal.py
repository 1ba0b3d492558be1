"""Scale rehearsal (round-2 verdict item #5): a ~10x local blowup of the
driver testdata, re-keyed so it is new data rather than a cache hit, run
through the most expensive queries. Catches plans that only look right at
sf0.1:

- plan invariants must hold at 10x (no CartesianProduct, no nested-loop
  join, no single-partition window, dimension broadcasts stay broadcast);
- wall-time must scale sub-quadratically (10x data on the same cores must
  cost far less than 100x the 1x time — a quadratic pair-blowup or a
  collapsed-to-one-partition stage fails the ratio bound).
"""

from __future__ import annotations

import contextlib
import io
import os
import time

import pytest

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import all_queries

QUERIES = all_queries()
BLOWUP = 10
# rehearse from sf0.01 when available (blown = sf0.1-equivalent volume);
# the suite-wide sf0.001 is too overhead-dominated to separate scaling
# regimes
_PREFERRED = "/root/testdata/sf0.01"
BASE_SF = (
    _PREFERRED
    if os.path.isdir(_PREFERRED)
    else os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
)
# the most expensive bench entries that exercise distinct shapes:
# bucketed range join, as-of partial-agg join, MinHash band join, a
# six-table TPC-H shape, the iterative centroid loop, the gram-hash span
# dedup (explode-heavy), the double-window SCD2 collapse, and (round-5
# widening) the remaining heavy bench shapes with no 10x evidence:
# chunked interval x interval join, PQ subspace training, the postings
# self-join TF-IDF / BM25 pair, the iterative frontier closure, and the
# BPE train+encode loop (distinct-word working set).
REHEARSAL = [
    "q_join_range",
    "q_join_asof",
    "q_dedup_near",
    "q_shape_q5",
    "q_kmeans_assign",
    "q_dedup_spans",
    "q_scd2_build",
    "q_join_interval",
    "q_pq_codes",
    "q_text_tfidf",
    "q_text_bm25",
    "q_graph_ancestors",
    "q_bpe_encode",
]
# TF-IDF / BM25 attach a 1-row corpus-stats aggregate (N, avgdl) to every
# posting via a broadcast crossJoin, which compiles to a
# BroadcastNestedLoopJoin with a provably-1-row build side — the accepted
# bounded pattern (plans/lint.py). Any OTHER nested loop is still a fail.
_BNLJ_OK = {"q_text_tfidf", "q_text_bm25"}


def _replicate(df, i: int):
    return df.withColumn("__i", F.lit(i))


@pytest.fixture(scope="module")
def blown_dir(spark, tmp_path_factory) -> str:
    """sf table dir with events/orders/lineitem/documents/embeddings
    multiplied 10x (re-keyed copies), everything else symlinked."""
    out = str(tmp_path_factory.mktemp("blown"))
    mult = spark.range(BLOWUP).select(F.col("id").cast("int").alias("__i"))

    def blow(name: str, rekey):
        src = spark.read.parquet(os.path.join(BASE_SF, f"{name}.parquet"))
        big = rekey(src.crossJoin(F.broadcast(mult))).drop("__i")
        big.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    blow(
        "events",
        lambda df: df.withColumn("event_id", F.col("event_id") * BLOWUP + F.col("__i"))
        .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("__i"))),
    )
    blow(
        "orders",
        lambda df: df.withColumn("o_orderkey", F.col("o_orderkey") * BLOWUP + F.col("__i")),
    )
    blow(
        "lineitem",
        lambda df: df.withColumn("l_orderkey", F.col("l_orderkey") * BLOWUP + F.col("__i")),
    )
    blow(
        "documents",
        lambda df: df.withColumn("doc_id", F.col("doc_id") * BLOWUP + F.col("__i"))
        # perturb the text so copies are new documents, not near-dups —
        # this isolates scan/shuffle scaling from genuine dup discovery
        .withColumn("text", F.concat(F.col("__i").cast("string"), F.lit(" "), F.col("text"))),
    )
    blow(
        "embeddings",
        lambda df: df.withColumn("vec_id", F.col("vec_id") * BLOWUP + F.col("__i"))
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x, j: x + (F.col("__i") * 0.001) * (j == 0).cast("float")),
        ),
    )
    for name in ("region", "nation", "customer", "supplier", "part"):
        os.symlink(
            os.path.join(BASE_SF, f"{name}.parquet"),
            os.path.join(out, f"{name}.parquet"),
        )
    return out


def _plan(spark, sf_dir, name) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def _seconds(spark, sf_dir, name, runs=2) -> float:
    best = float("inf")
    for _ in range(runs):
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best


@pytest.mark.slow
@pytest.mark.parametrize("name", REHEARSAL)
def test_plan_invariants_hold_at_10x(spark, blown_dir, name):
    p = _plan(spark, blown_dir, name)
    assert "CartesianProduct" not in p, f"{name} degrades to cartesian at 10x"
    if name in _BNLJ_OK:
        # only the documented 1-row-broadcast form may appear
        residue = p.replace("BroadcastNestedLoopJoin", "")
        assert "NestedLoop" not in residue, f"{name}: non-broadcast nested loop at 10x"
    else:
        assert "NestedLoop" not in p, f"{name} degrades to nested-loop at 10x"
    # a window running on a single partition means the whole table
    # funnels through one task — the classic silent scale-killer
    for i, line in enumerate(p.splitlines()):
        if "Exchange SinglePartition" in line:
            ctx = "\n".join(p.splitlines()[max(0, i - 3) : i + 4])
            assert "Window" not in ctx, f"{name}: single-partition window at 10x:\n{ctx}"


@pytest.mark.slow
def test_dimension_broadcast_survives_10x(spark, blown_dir):
    """q_shape_q5's dimension joins (region/nation/customer/supplier)
    must still broadcast when the fact side is 10x — losing the broadcast
    turns them into full shuffles of the fact table."""
    assert "BroadcastHashJoin" in _plan(spark, blown_dir, "q_shape_q5")


@pytest.mark.slow
@pytest.mark.parametrize("name", REHEARSAL)
def test_wall_time_scales_subquadratically(spark, blown_dir, name):
    """10x data: linear scaling lands well under 10x wall-time on 8 cores
    with fixed overheads; quadratic lands near 100x. 25x separates the
    regimes cleanly.

    Load-aware form (round 9, VERDICT r8 #2): the old absolute 10 s floor
    false-redded q_join_asof when a co-tenant Spark session shared the
    host (11.14 s measured, 25 s total on isolated re-run). Now the 1x
    base runs BRACKET the 10x run — a co-tenant spike inflates the
    co-measured base alongside the numerator, so the bound tracks host
    load instead of wall-clock absolutes — and a transient spike that
    hits only the 10x window gets one full re-measure before failing.
    The 0.4 s base floor keeps the quiet-host limit at the old 10 s for
    overhead-dominated entries; a quadratic blowup still exceeds the
    bound on both attempts."""
    _seconds(spark, BASE_SF, name, runs=1)  # codegen warmup
    last = ""
    for _attempt in range(2):
        t1_pre = _seconds(spark, BASE_SF, name)
        t10 = _seconds(spark, blown_dir, name)
        t1_post = _seconds(spark, BASE_SF, name, runs=1)
        base = max(t1_pre, t1_post, 0.4)
        limit = 25.0 * base
        if t10 <= limit:
            return
        last = (
            f"{name}: base {t1_pre:.2f}/{t1_post:.2f}s -> {t10:.2f}s at 10x "
            f"(limit {limit:.1f}s)"
        )
    pytest.fail(f"superquadratic on both attempts: {last}")


@pytest.mark.slow
def test_semdedup_at_10x_with_sqrt_scaled_k(spark):
    """SemDeDup's scale contract (llm/semdedup.py::semantic_dedup): k must
    grow with the corpus. At k ≈ √n the total work — Lloyd O(n·k) plus
    pairs O(n²/k) — is O(n^1.5), the operating point this rehearses.

    The 10× corpus is stride-re-keyed (copy c of vector v gets id
    v + c·n₀) so the first-k seeds stay DISTINCT vectors; the interleaved
    re-keying the other rehearsals use would make every seed a copy of
    the same 8 originals and collapse the clustering. The 10 exact copies
    of every vector double as ground truth: each copy group must dedup to
    its lowest id, so ≥ 9·n₀ rows must be dropped.
    """
    import math

    from graph_vulcan_assets_spark.llm.kmeans import quantize_vectors
    from graph_vulcan_assets_spark.llm.semdedup import _augmented, semantic_dedup
    from graph_vulcan_assets_spark.plans.lint import plan_text
    from graph_vulcan_assets_spark.tables import load_table

    emb = load_table(spark, BASE_SF, "embeddings")
    n0 = emb.count()
    blown = (
        emb.crossJoin(spark.range(BLOWUP).select(F.col("id").cast("long").alias("__c")))
        .withColumn("vec_id", F.col("vec_id") + F.col("__c") * n0)
        .drop("__c")
    )
    k = max(8, int(math.sqrt(BLOWUP * n0)))
    vecs = _augmented(quantize_vectors(blown))
    result = semantic_dedup(vecs, k)

    p = plan_text(result)
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p

    start = time.perf_counter()
    dropped = result.count()
    wall = time.perf_counter() - start
    # every copy group (10 identical vectors, same cluster by exactness)
    # loses 9 members; twins add more
    assert dropped >= 9 * n0, f"only {dropped} dropped, expected >= {9 * n0}"
    assert wall < 120.0, f"semdedup 10x took {wall:.1f}s"
