"""Change data feed on BucketTable (BucketTable.changes)."""

from __future__ import annotations

import pytest

from graph_vulcan_assets_spark.sources.bucketstore import BucketTable


@pytest.fixture()
def table(spark, tmp_path):
    return BucketTable(spark, str(tmp_path / "t"), key_cols=["k"], n_buckets=8)


def _diff(table, since, until=None):
    return {
        r["k"]: (
            r["change_type"],
            r["before"]["v"] if r["before"] is not None else None,
            r["after"]["v"] if r["after"] is not None else None,
        )
        for r in table.changes(since, until).collect()
    }


def test_insert_update_delete_classified(spark, table):
    v0 = table.upsert(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["k", "v"])
    )
    table.upsert(spark.createDataFrame([(1, "V1"), (100, "new")], ["k", "v"]))
    v2 = table.delete(spark.createDataFrame([(7,)], ["k"]))

    got = _diff(table, v0, v2)
    assert got == {
        1: ("update", "v1", "V1"),
        100: ("insert", None, "new"),
        7: ("delete", "v7", None),
    }


def test_identical_rewrite_is_not_a_change(spark, table):
    v0 = table.upsert(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["k", "v"])
    )
    # rewrite key 3 with the SAME value, key 4 with a new one
    table.upsert(spark.createDataFrame([(3, "v3"), (4, "NEW")], ["k", "v"]))
    got = _diff(table, v0)
    assert got == {4: ("update", "v4", "NEW")}


def test_no_changes_returns_typed_empty(spark, table):
    v0 = table.upsert(spark.createDataFrame([(1, "a")], ["k", "v"]))
    df = table.changes(v0, v0)
    assert df.count() == 0
    assert set(df.columns) == {"k", "change_type", "before", "after"}


def test_only_touched_buckets_are_read(spark, table):
    """The CDC pruning contract: the changed-bucket set after a one-key
    upsert is exactly that key's bucket."""
    v0 = table.upsert(
        spark.createDataFrame([(i, f"v{i}") for i in range(200)], ["k", "v"])
    )
    v1 = table.upsert(spark.createDataFrame([(5, "V5")], ["k", "v"]))
    changed = table._changed_buckets(v0, v1)
    assert len(changed) == 1
    # and the diff over that pruned slice is still exactly right
    assert _diff(table, v0, v1) == {5: ("update", "v5", "V5")}


def test_chained_windows_compose(spark, tmp_path):
    """diff(v0→v1) ∘ diff(v1→v2) covers the same keys as diff(v0→v2).

    keep_versions=3 so the v0 view survives all three commits — a CDC
    consumer diffing across N commits needs a retention of N+1, exactly
    like Delta CDF retention (each window must stay inside the pruning
    horizon; test_bucketstore_model.py pins what happens when it doesn't).
    """
    table = BucketTable(
        spark, str(tmp_path / "t3"), key_cols=["k"], n_buckets=8, keep_versions=3
    )
    v0 = table.upsert(
        spark.createDataFrame([(i, f"a{i}") for i in range(20)], ["k", "v"])
    )
    v1 = table.upsert(
        spark.createDataFrame([(3, "b3"), (21, "b21")], ["k", "v"])
    )
    v2 = table.delete(spark.createDataFrame([(3,), (10,)], ["k"]))

    d01, d12, d02 = _diff(table, v0, v1), _diff(table, v1, v2), _diff(table, v0, v2)
    assert d01 == {3: ("update", "a3", "b3"), 21: ("insert", None, "b21")}
    assert d12 == {3: ("delete", "b3", None), 10: ("delete", "a10", None)}
    # net effect: 3 existed at v0 and is gone at v2; 21 inserted; 10 gone
    assert d02 == {
        3: ("delete", "a3", None),
        21: ("insert", None, "b21"),
        10: ("delete", "a10", None),
    }


def test_replica_follows_source_via_feed(spark, tmp_path):
    """CDC round trip: applying each changes() window to a replica keeps
    it identical to the source."""
    src = BucketTable(
        spark, str(tmp_path / "src"), key_cols=["k"], n_buckets=8, keep_versions=3
    )
    dst = BucketTable(spark, str(tmp_path / "dst"), key_cols=["k"], n_buckets=8)

    v0 = src.upsert(
        spark.createDataFrame([(i, f"a{i}") for i in range(30)], ["k", "v"])
    )
    # bootstrap: full copy of the initial view
    dst.upsert(src.read(version=v0))

    v1 = src.upsert(spark.createDataFrame([(3, "b3"), (31, "b31")], ["k", "v"]))
    dst.apply_changes(src.changes(v0, v1))
    v2 = src.delete(spark.createDataFrame([(3,), (10,)], ["k"]))
    dst.apply_changes(src.changes(v1, v2))

    def rows(t):
        return sorted((r["k"], r["v"]) for r in t.read().collect())

    assert rows(dst) == rows(src)
