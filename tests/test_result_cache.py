"""Plan-fingerprint result cache (plans/cache.py)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.plans.cache import ResultCache, plan_fingerprint
from graph_vulcan_assets_spark.tables import load_table


def _q(spark, src):
    return (
        spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_fingerprint_stable_across_rebuilds_and_sensitive_to_query(spark, sf_dir):
    e1 = load_table(spark, sf_dir, "events").where("user_id > 5").select("event_id")
    e2 = load_table(spark, sf_dir, "events").where("user_id > 5").select("event_id")
    e3 = load_table(spark, sf_dir, "events").where("user_id > 6").select("event_id")
    assert plan_fingerprint(e1) == plan_fingerprint(e2)
    assert plan_fingerprint(e1) != plan_fingerprint(e3)


def test_fingerprint_distinguishes_hash_literals_and_expr_identity(spark, sf_dir):
    """ADVICE r3 (medium): erasing '#<n>' tokens collapsed distinct plans.
    Canonical renumbering must keep apart (a) literals whose TEXT matches
    the expr-id pattern and (b) self-join conditions distinguished only by
    which side's attribute is referenced — while still giving the same
    key to the same query re-derived with fresh session expr ids."""
    docs = load_table(spark, sf_dir, "documents")
    lit1 = docs.where(F.col("lang") == "#1").select("doc_id")
    lit2 = docs.where(F.col("lang") == "#2").select("doc_id")
    assert plan_fingerprint(lit1) != plan_fingerprint(lit2)
    # literal TEXT imitating an attribute reference (word char before the
    # '#') — the case string-level regex normalization cannot distinguish
    lit3 = docs.where(F.col("lang") == "x#1").select("doc_id")
    lit4 = docs.where(F.col("lang") == "x#2").select("doc_id")
    assert plan_fingerprint(lit3) != plan_fingerprint(lit4)

    # canonicalization erases aliases; the schema term must keep apart two
    # queries differing only in output column names (a hit re-reads the
    # materialized parquet BY NAME — serving x-named files to a y-named
    # plan would return nulls)
    ax = docs.select(F.col("doc_id").alias("x"))
    ay = docs.select(F.col("doc_id").alias("y"))
    assert plan_fingerprint(ax) != plan_fingerprint(ay)

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    a, b = e.alias("a"), e.alias("b")
    fwd = a.join(b, F.col("a.user_id") < F.col("b.user_id")).select(
        F.col("a.event_id")
    )
    rev = a.join(b, F.col("b.user_id") < F.col("a.user_id")).select(
        F.col("a.event_id")
    )
    assert plan_fingerprint(fwd) != plan_fingerprint(rev)

    # same self-join re-derived from scratch → fresh raw expr ids, same key
    e2 = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    a2, b2 = e2.alias("a"), e2.alias("b")
    fwd2 = a2.join(b2, F.col("a.user_id") < F.col("b.user_id")).select(
        F.col("a.event_id")
    )
    assert plan_fingerprint(fwd) == plan_fingerprint(fwd2)


def test_hit_serves_materialized_result_and_data_change_invalidates(spark, tmp_path):
    src = str(tmp_path / "src")
    rows1 = [(i, "a" if i % 2 == 0 else "b") for i in range(100)]
    spark.createDataFrame(rows1, "event_id long, event_type string").write.mode(
        "overwrite"
    ).parquet(src)

    cache = ResultCache(spark, str(tmp_path / "cache"))
    q = _q(spark, src)
    assert cache.lookup(q) is None
    first = {r.event_type: r.n for r in cache.get_or_compute(q).collect()}
    assert first == {"a": 50, "b": 50}

    # mutate the backing data; a STALE fingerprint would keep serving the
    # old counts — re-fingerprinting the same plan must now miss
    time.sleep(0.01)
    rows2 = [(i, "a") for i in range(30)]
    spark.createDataFrame(rows2, "event_id long, event_type string").write.mode(
        "overwrite"
    ).parquet(src)
    q2 = _q(spark, src)
    assert cache.lookup(q2) is None
    assert {r.event_type: r.n for r in cache.get_or_compute(q2).collect()} == {"a": 30}

    # crash-safety: a data dir without its marker is a miss
    fp_dirs = [d for d in os.listdir(str(tmp_path / "cache")) if not d.endswith(".ok")]
    assert fp_dirs
    marker = os.path.join(str(tmp_path / "cache"), fp_dirs[0] + ".ok")
    os.remove(marker)
    q3 = _q(spark, src)
    # whichever entry lost its marker, lookups still never return a
    # truncated hit (missing marker == miss)
    hit = cache.lookup(q3)
    if hit is not None:
        assert {r.event_type: r.n for r in hit.collect()} == {"a": 30}
