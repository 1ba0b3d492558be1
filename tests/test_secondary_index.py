"""CDF-maintained secondary index (sources/secondary_index.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.sources.bucketstore import BucketTable
from graph_vulcan_assets_spark.sources.secondary_index import SecondaryIndex


def _rows(spark, *rws):
    return spark.createDataFrame(list(rws), "k long, city string, qty long")


def _check_consistent(idx, base):
    """Every distinct value's lookup equals the base full-scan filter."""
    for v in [r.city for r in base.read().select("city").distinct().collect()]:
        got = sorted(r.k for r in idx.lookup(v).collect())
        want = sorted(r.k for r in base.read().where(F.col("city") == v).collect())
        assert got == want, v


def test_initial_build_then_incremental(spark, tmp_path):
    base = BucketTable(spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=8)
    base.upsert(_rows(spark, (1, "oslo", 10), (2, "lima", 20), (3, "oslo", 30)))
    idx = SecondaryIndex(spark, str(tmp_path / "idx"), base, "city", n_buckets=8)
    idx.refresh()
    _check_consistent(idx, base)

    # moves between values, a delete, and a new key — refresh must track
    base.upsert(_rows(spark, (1, "lima", 11), (4, "pune", 40)))
    base.delete(spark.createDataFrame([(2,)], "k long"))
    idx.refresh()
    _check_consistent(idx, base)
    assert sorted(r.k for r in idx.lookup("lima").collect()) == [1]
    assert idx.lookup("nowhere").count() == 0


def test_value_change_only_rows_touch_index(spark, tmp_path):
    base = BucketTable(spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=4)
    base.upsert(_rows(spark, (1, "oslo", 10), (2, "lima", 20)))
    idx = SecondaryIndex(spark, str(tmp_path / "idx"), base, "city", n_buckets=4)
    idx.refresh()
    n_commits = len(idx.table.commits())
    # qty changes, city does NOT: no index delete AND no index upsert
    base.upsert(_rows(spark, (1, "oslo", 99)))
    idx.refresh()
    assert len(idx.table.commits()) == n_commits
    _check_consistent(idx, base)


def test_refresh_idempotent_and_crash_rerun_safe(spark, tmp_path):
    base = BucketTable(spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=4)
    base.upsert(_rows(spark, (1, "oslo", 10)))
    idx = SecondaryIndex(spark, str(tmp_path / "idx"), base, "city", n_buckets=4)
    idx.refresh()
    base.upsert(_rows(spark, (1, "lima", 11), (2, "oslo", 20)))
    idx.refresh()
    before = sorted(tuple(r) for r in idx.table.read().collect())
    idx.refresh()  # no new base commits: no-op
    assert sorted(tuple(r) for r in idx.table.read().collect()) == before

    # crash simulation: wind the high-water mark back (as if it never
    # persisted) and re-run the same diff — index must converge, not drift
    idx._save_hwm(base.commits()[0])
    idx.refresh()
    assert sorted(tuple(r) for r in idx.table.read().collect()) == before
    _check_consistent(idx, base)


def test_lookup_rows_and_bucket_pruning(spark, tmp_path):
    base = BucketTable(spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=8)
    base.upsert(
        _rows(spark, *[(i, f"c{i % 5}", i * 10) for i in range(50)])
    )
    idx = SecondaryIndex(spark, str(tmp_path / "idx"), base, "city", n_buckets=8)
    idx.refresh()
    rows = idx.lookup_rows("c3").collect()
    assert sorted((r.k, r.qty) for r in rows) == [(i, i * 10) for i in range(50) if i % 5 == 3]
    # the probe's pruned read opens exactly the value's bucket
    probe = spark.createDataFrame([("c3",)], "city string")
    assert len(idx.table._touched(probe)) == 1


def test_indexing_a_key_column_rejected(spark, tmp_path):
    base = BucketTable(spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=4)
    base.upsert(_rows(spark, (1, "oslo", 10)))
    with pytest.raises(ValueError):
        SecondaryIndex(spark, str(tmp_path / "idx"), base, "k")


def test_crash_then_base_advances_does_not_leak_intermediate_value(spark, tmp_path):
    """Round-4 fix: a refresh that applied its window but crashed before
    the hwm advanced, followed by MORE base commits, used to leak the
    intermediate value's entry forever (the re-run diff's 'before' was
    the pre-crash value, not the one actually indexed). The pending
    target marker makes recovery re-apply exactly the crashed window."""
    base = BucketTable(spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=4)
    c0 = base.upsert(_rows(spark, (1, "v0", 10)))
    idx = SecondaryIndex(spark, str(tmp_path / "idx"), base, "city", n_buckets=4)
    idx.refresh()

    # crashed attempt: window [c0 -> c1] fully applied, hwm NOT advanced
    c1 = base.upsert(_rows(spark, (1, "v1", 11)))
    idx._set_target(c1)
    idx._apply_window(c0, c1)
    # (crash here: no _save_hwm, no _clear_target)

    # base advances again before the next refresh
    base.upsert(_rows(spark, (1, "v2", 12)))
    idx.refresh()
    _check_consistent(idx, base)
    assert idx.lookup("v1").count() == 0  # the leak the old code left
    assert sorted(r.k for r in idx.lookup("v2").collect()) == [1]


def test_refresh_outside_pruning_window_full_resyncs(spark, tmp_path):
    """Round-4 fix: when the index falls behind the base's keep_versions
    window, the change feed's before-image is gone — the old code diffed
    against a silently-EMPTY view, so deletes never produced index
    removals and stale entries answered lookups forever. The time-travel
    read now raises and refresh() falls back to a full resync."""
    base = BucketTable(
        spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=2, keep_versions=2
    )
    base.upsert(_rows(spark, (1, "oslo", 10), (2, "lima", 20)))
    idx = SecondaryIndex(spark, str(tmp_path / "idx"), base, "city", n_buckets=2)
    idx.refresh()

    # three commits touching the same buckets: the index's hwm version is
    # pruned out of retention (keep_versions=2)
    base.upsert(_rows(spark, (1, "pune", 11)))
    base.delete(spark.createDataFrame([(2,)], "k long"))
    base.upsert(_rows(spark, (3, "oslo", 30)))

    # non-vacuity: the incremental window really is unreadable now
    with pytest.raises(ValueError):
        base.read(version=idx.indexed_through())

    idx.refresh()
    _check_consistent(idx, base)
    # the deleted key must NOT answer lookups through a stale entry
    assert idx.lookup("lima").count() == 0
    assert sorted(r.k for r in idx.lookup("oslo").collect()) == [3]
    assert sorted(r.k for r in idx.lookup("pune").collect()) == [1]


def test_lookup_before_first_refresh_is_typed_empty(spark, tmp_path):
    base = BucketTable(spark, str(tmp_path / "base"), key_cols=["k"], n_buckets=4)
    base.upsert(_rows(spark, (1, "oslo", 10)))
    idx = SecondaryIndex(spark, str(tmp_path / "idx"), base, "city", n_buckets=4)
    empty = idx.lookup("oslo")
    assert empty.columns == ["k"] and empty.count() == 0
