"""Embedding-operator tests: quantization quality, projection determinism,
and the Johnson-Lindenstrauss distance-preservation property the random
projection exists for. (Oracle parity for q_embed_quantize runs in
test_oracle_parity.py; these cover what a SQL oracle can't.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.embeddings import project_embeddings
from graph_vulcan_assets_spark.registry import all_queries
from graph_vulcan_assets_spark.tables import load_table

QUERIES = all_queries()


def test_quantization_error_bounded(spark, sf_dir):
    """Int8 scalar quantization error is at most half a quantization step
    per component: |err| <= (mx - mn) / (2 * 255) for every dimension."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", F.posexplode("embedding").alias("dim", "fval")).select(
        "dim", F.col("fval").cast("double").alias("val")
    )
    spread = (
        ex.groupBy("dim")
        .agg((F.max("val") - F.min("val")).alias("spread"))
        .agg(F.max("spread"))
        .first()[0]
    )
    max_err = (
        QUERIES["q_embed_quantize"](spark, sf_dir).agg(F.max("max_err")).first()[0]
    )
    assert max_err <= spread / (2 * 255) + 1e-9


def test_projection_deterministic_across_runs(spark, sf_dir):
    """Two independent executions produce bit-identical projections (the
    matrix is re-derived from a fixed seed inside every executor)."""
    e = load_table(spark, sf_dir, "embeddings").limit(50)
    a = {r["vec_id"]: r["projected"] for r in project_embeddings(e).collect()}
    b = {r["vec_id"]: r["projected"] for r in project_embeddings(e).collect()}
    assert a == b


def test_projection_preserves_distances(spark, sf_dir):
    """JL property: relative pairwise squared distances survive 64→16
    projection within a loose (1 ± 0.75) band — random projections are
    unbiased, so gross violations mean the matmul or matrix is wrong."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 40)
    rows = project_embeddings(e).select("vec_id", "embedding", "projected").collect()
    rows.sort(key=lambda r: r["vec_id"])
    checked = 0
    for i in range(0, len(rows) - 1, 2):
        a, b = rows[i], rows[i + 1]
        d_orig = sum((x - y) ** 2 for x, y in zip(a["embedding"], b["embedding"]))
        d_proj = sum((x - y) ** 2 for x, y in zip(a["projected"], b["projected"]))
        if d_orig > 1e-12:
            ratio = d_proj / d_orig
            assert 0.25 < ratio < 1.75, f"pair ({a['vec_id']},{b['vec_id']}): {ratio}"
            checked += 1
    assert checked >= 10


def test_projection_output_shape(spark, sf_dir):
    out = QUERIES["q_embed_project"](spark, sf_dir)
    row = out.first()
    assert row["out_dim"] == 16
    assert row["norm_sq"] is not None and not math.isnan(row["norm_sq"])


def test_matryoshka_energy_bounds(spark, sf_dir):
    from graph_vulcan_assets_spark.llm.embeddings import q_embed_matryoshka

    rows = q_embed_matryoshka(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r["nrm_head"] <= r["nrm_full"]
        assert 0 < r["energy_micros"] <= 1_000_000


def test_pq_gate_evaluates_once_per_pipeline(spark, sf_dir):
    """The corrupt-vector gate (finite_embeddings + EMBED_BOUND) sits
    BEFORE _quantized_packed's eager localCheckpoint, so a multi-stage PQ
    pipeline pays it exactly once — downstream Lloyd/ADC stages read the
    checkpointed RDD, never the parquet source (VERDICT r5 #2: the gate
    must not re-evaluate per stage). Plan-level proof: every frame built
    on the checkpointed vecs shows zero parquet scans and zero
    ArrayForAll/forall filters."""
    import contextlib
    import io

    from graph_vulcan_assets_spark.llm import pq

    vecs = pq._quantized_packed(spark, sf_dir)
    try:
        assign, cent = pq._train_all(vecs)
        for frame in (assign, cent):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                frame.explain("formatted")
            plan = buf.getvalue()
            assert "Scan parquet" not in plan, "training re-read the source"
            assert "forall" not in plan.lower(), "gate re-evaluated post-checkpoint"
            assert "Scan ExistingRDD" in plan  # the checkpoint is the source
    finally:
        vecs.unpersist()


def test_embed_bound_override_is_validated(monkeypatch):
    """GVAS_EMBED_BOUND guardrails (ADVICE r7): a malformed value must
    fail with a named, actionable error (not a bare float() traceback at
    import), and an override past the BIGINT-headroom ceiling — which
    would silently re-enable the ANSI overflow crashes the bound exists
    to prevent — must be rejected loudly."""
    import pytest

    from graph_vulcan_assets_spark.llm import embeddings as E

    monkeypatch.setenv("GVAS_EMBED_BOUND", "not-a-number")
    with pytest.raises(ValueError, match="GVAS_EMBED_BOUND"):
        E._validated_embed_bound()

    # past the ceiling: dim*(2*bound*1e6)^2 > BIGINT for bound ~ 1e4
    monkeypatch.setenv("GVAS_EMBED_BOUND", "10000")
    with pytest.raises(ValueError, match="BIGINT"):
        E._validated_embed_bound()

    monkeypatch.setenv("GVAS_EMBED_BOUND", "-1")
    with pytest.raises(ValueError):
        E._validated_embed_bound()

    monkeypatch.setenv("GVAS_EMBED_BOUND", "50.5")
    assert E._validated_embed_bound() == 50.5

    monkeypatch.delenv("GVAS_EMBED_BOUND")
    assert E._validated_embed_bound() == 100.0
