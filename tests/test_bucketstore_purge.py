"""Right-to-be-forgotten purge on BucketTable (BucketTable.purge)."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from graph_vulcan_assets_spark.sources.bucketstore import BucketTable


@pytest.fixture()
def table(spark, tmp_path):
    return BucketTable(
        spark, str(tmp_path / "t"), key_cols=["k"], n_buckets=8, keep_versions=3
    )


def _disk_keys(table) -> set[int]:
    """Every key present in ANY parquet file under the table dir — the
    compliance question is about bytes on disk, not any resolved view."""
    files = glob.glob(os.path.join(table.path, "batch=*", "bucket=*", "*.parquet"))
    if not files:
        return set()
    return {
        r[0]
        for f in files
        for r in duckdb.sql(f"SELECT k FROM '{f}'").fetchall()
    }


def test_purge_erases_from_all_retained_versions(spark, table):
    table.upsert(spark.createDataFrame([(i, f"a{i}") for i in range(30)], ["k", "v"]))
    table.upsert(spark.createDataFrame([(5, "b5"), (6, "b6")], ["k", "v"]))
    table.upsert(spark.createDataFrame([(5, "c5")], ["k", "v"]))
    assert 5 in _disk_keys(table)

    table.purge(spark.createDataFrame([(5,)], ["k"]))

    # gone from disk entirely — including the historical versions delete()
    # would have left behind
    assert 5 not in _disk_keys(table)
    # live view: only 5 is gone
    live = {r["k"] for r in table.read().collect()}
    assert live == set(range(30)) - {5}
    # time travel still works for retained commits, minus the purged key;
    # commits whose as-of view lost a bucket to pruning now raise loudly
    # (round-4 change) instead of silently serving a partial view
    readable = 0
    for v in table.commits():
        try:
            view = table.read(version=v)
        except ValueError:
            continue  # outside retained history — loud by design
        readable += 1
        assert 5 not in {r["k"] for r in view.collect()}
    assert readable >= 1, "no commit remained time-travel-readable"


def test_purge_leaves_untouched_buckets_byte_identical(spark, table):
    table.upsert(spark.createDataFrame([(i, f"a{i}") for i in range(200)], ["k", "v"]))

    def files():
        out = {}
        for p in glob.glob(
            os.path.join(table.path, "batch=*", "bucket=*", "*.parquet")
        ):
            with open(p, "rb") as f:
                out[p] = f.read()
        return out

    before = files()
    purged_bucket = table._touched(spark.createDataFrame([(7,)], ["k"]))
    table.purge(spark.createDataFrame([(7,)], ["k"]))
    after = files()
    untouched_before = {
        p: c
        for p, c in before.items()
        if not any(f"bucket={b}" in p for b in purged_bucket)
    }
    for p, content in untouched_before.items():
        assert after.get(p) == content, f"untouched file changed: {p}"


def test_purge_is_idempotent(spark, table):
    table.upsert(spark.createDataFrame([(i, f"a{i}") for i in range(10)], ["k", "v"]))
    table.purge(spark.createDataFrame([(3,)], ["k"]))
    table.purge(spark.createDataFrame([(3,)], ["k"]))  # re-run completes cleanly
    assert 3 not in _disk_keys(table)
    assert {r["k"] for r in table.read().collect()} == set(range(10)) - {3}


def test_purge_with_keys_derived_from_the_table_itself(spark, table):
    """The realistic erasure request: 'purge user X' selects the key set
    FROM the table being purged. The lazy plan behind that frame gets
    invalidated by purge's own rewrites unless purge materializes it
    first — regression test for exactly that."""
    rows = [(i, f"u{i % 5}") for i in range(50)]
    table.upsert(spark.createDataFrame(rows, ["k", "v"]))
    table.upsert(spark.createDataFrame([(3, "u3x")], ["k", "v"]))  # history

    from pyspark.sql import functions as F

    victim_keys = table.read().where(F.col("v") == "u2").select("k")
    expected_gone = {k for k, v in rows if v == "u2"}
    table.purge(victim_keys)

    assert expected_gone.isdisjoint(_disk_keys(table))
    live = {r["k"] for r in table.read().collect()}
    assert live == set(range(50)) - expected_gone
