"""Custom Python DataSource over BucketTable (sources/pyds.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.sources.bucketstore import BucketTable
from graph_vulcan_assets_spark.sources.pyds import (
    BucketTableDataSource,
    bucket_of_long,
    xxhash64_long,
)


def test_python_xxhash64_matches_jvm(spark):
    vals = [0, 1, -1, 7, 123456789, -987654321, 2**62, -(2**62)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "k long")
        .select("k", F.xxhash64("k").alias("h"), F.pmod(F.xxhash64("k"), F.lit(16)).alias("b"))
        .collect()
    )
    for r in rows:
        assert xxhash64_long(r.k) == r.h
        assert bucket_of_long(r.k, 16) == r.b


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pyds") / "bt")
    t = BucketTable(spark, p, key_cols=["k"], n_buckets=8)
    t.upsert(spark.createDataFrame([(i, f"v{i}") for i in range(200)], "k long, val string"))
    t.upsert(spark.createDataFrame([(5, "v5b"), (300, "v300")], "k long, val string"))
    spark.dataSource.register(BucketTableDataSource)
    return t


def test_reads_current_view(spark, table):
    df = spark.read.format("buckettable").option("path", table.path).load()
    got = {r.k: r.val for r in df.collect()}
    want = {r.k: r.val for r in table.read().collect()}
    assert got == want and got[5] == "v5b" and got[300] == "v300"


def test_time_travel_option(spark, table):
    first = table.commits()[0]
    df = (
        spark.read.format("buckettable")
        .option("path", table.path)
        .option("version", str(first))
        .load()
    )
    got = {r.k: r.val for r in df.collect()}
    assert got[5] == "v5" and 300 not in got


def test_partition_per_bucket(spark, table):
    df = spark.read.format("buckettable").option("path", table.path).load()
    # 8 buckets -> 8 planned partitions
    assert df.rdd.getNumPartitions() == 8


def test_key_option_prunes_to_one_bucket(spark, table):
    df = (
        spark.read.format("buckettable")
        .option("path", table.path)
        .option("key", "5")
        .load()
    )
    assert [(r.k, r.val) for r in df.collect()] == [(5, "v5b")]
    # pruning observable at the planner level
    from graph_vulcan_assets_spark.sources.pyds import BucketTableReader

    base = BucketTableReader(df.schema, {"path": table.path})
    pruned = BucketTableReader(df.schema, {"path": table.path, "key": "5"})
    assert len(base.partitions()) == 8 and len(pruned.partitions()) == 1
    assert f"bucket={bucket_of_long(5, 8)}" in pruned.partitions()[0].directory


def test_prune_correctness_every_key(spark, table):
    # a wrong bucket computation would silently return 0 rows for some key
    for k in [0, 5, 77, 199, 300]:
        df = (
            spark.read.format("buckettable")
            .option("path", table.path)
            .option("key", str(k))
            .load()
        )
        assert df.count() == 1, k


# ---------------------------------------------------------------------------
# Change-feed streaming source
# ---------------------------------------------------------------------------


def test_diff_commits_matches_jvm_changes(spark, tmp_path):
    from graph_vulcan_assets_spark.sources.pyds import diff_commits

    p = str(tmp_path / "bt")
    t = BucketTable(spark, p, key_cols=["k"], n_buckets=4)
    v0 = t.upsert(spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k long, val string"))
    v1 = t.upsert(spark.createDataFrame([(3, "v3b"), (50, "new")], "k long, val string"))
    v2 = t.delete(spark.createDataFrame([(7,)], "k long"))

    for since, until in [(v0, v1), (v1, v2), (v0, v2)]:
        got = sorted(diff_commits(p, ["k"], since, until))
        want = sorted(
            (r.k, r.change_type, None if r.after is None else r.after.val)
            for r in t.changes(since, until).collect()
        )
        assert got == want, (since, until)


def test_diff_commits_nan_values_are_not_spurious_updates(spark, tmp_path):
    """ADVICE r3: Python ``!=`` says NaN != NaN, so a NaN-bearing value
    column would re-emit its key as an 'update' on every commit touching
    its bucket. Both-NaN must compare equal (eqNullSafe semantics)."""
    from graph_vulcan_assets_spark.sources.pyds import diff_commits

    p = str(tmp_path / "bt")
    t = BucketTable(spark, p, key_cols=["k"], n_buckets=1)  # everything shares a bucket
    v0 = t.upsert(
        spark.createDataFrame(
            [(1, float("nan")), (2, 2.0)], "k long, score double"
        )
    )
    # touch the (shared) bucket with an unrelated key — key 1 is unchanged
    v1 = t.upsert(spark.createDataFrame([(3, 3.0)], "k long, score double"))
    got = sorted(diff_commits(p, ["k"], v0, v1))
    assert got == [(3, "insert", 3.0)]
    # a REAL change on the NaN row still surfaces
    v2 = t.upsert(spark.createDataFrame([(1, 1.5)], "k long, score double"))
    assert sorted(diff_commits(p, ["k"], v1, v2)) == [(1, "update", 1.5)]

    # NaN NESTED in an array value column: same rule (eqNullSafe treats
    # NaN as equal inside nested types too)
    p2 = str(tmp_path / "bt2")
    t2 = BucketTable(spark, p2, key_cols=["k"], n_buckets=1)
    w0 = t2.upsert(
        spark.createDataFrame([(1, [float("nan"), 2.0])], "k long, vec array<double>")
    )
    w1 = t2.upsert(spark.createDataFrame([(2, [3.0])], "k long, vec array<double>"))
    assert sorted(diff_commits(p2, ["k"], w0, w1)) == [(2, "insert", [3.0])]


def test_change_feed_schema_key_order_matches_tuples(spark, tmp_path):
    """ADVICE r3: the CDF schema must order key fields by meta key_cols
    (the tuple layout diff_commits emits), not by table-schema column
    order — a (long, long) composite key would otherwise silently
    transpose values."""
    from graph_vulcan_assets_spark.sources.pyds import BucketTableChangeFeedSource

    p = str(tmp_path / "bt")
    # schema column order (val, k2, k1) vs key_cols order (k1, k2)
    t = BucketTable(spark, p, key_cols=["k1", "k2"], n_buckets=2)
    t.upsert(
        spark.createDataFrame([("a", 100, 1), ("b", 200, 2)], "val string, k2 long, k1 long")
    )
    spark.dataSource.register(BucketTableChangeFeedSource)
    stream = spark.readStream.format("buckettable-cdf").option("path", p).load()
    assert stream.columns[:3] == ["k1", "k2", "change_type"]
    q = (
        stream.writeStream.format("memory")
        .queryName("cdf_keyorder_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.k1, r.k2, r.change_type, r.val)
        for r in spark.sql("SELECT * FROM cdf_keyorder_sink").collect()
    )
    assert got == [(1, 100, "insert", "a"), (2, 200, "insert", "b")]


def test_stream_reader_offsets_and_replay(spark, tmp_path):
    from graph_vulcan_assets_spark.sources.pyds import BucketTableStreamReader

    p = str(tmp_path / "bt")
    t = BucketTable(spark, p, key_cols=["k"], n_buckets=4)
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string"))
    r = BucketTableStreamReader({"path": p})
    rows1, off1 = r.read(r.initialOffset())
    rows1 = sorted(rows1)
    assert rows1 == [(1, "insert", "a"), (2, "insert", "b")]

    # no new commit: empty batch, offset unchanged
    rows_idle, off_idle = r.read(off1)
    assert list(rows_idle) == [] and off_idle == off1

    t.upsert(spark.createDataFrame([(2, "b2"), (3, "c")], "k long, val string"))
    rows2, off2 = r.read(off1)
    assert sorted(rows2) == [(2, "update", "b2"), (3, "insert", "c")]
    # checkpoint replay of the same committed range is deterministic
    assert sorted(r.readBetweenOffsets(off1, off2)) == [(2, "update", "b2"), (3, "insert", "c")]


def test_change_feed_end_to_end_stream(spark, tmp_path):
    from graph_vulcan_assets_spark.sources.pyds import BucketTableChangeFeedSource

    p = str(tmp_path / "bt")
    t = BucketTable(spark, p, key_cols=["k"], n_buckets=4)
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string"))
    t.upsert(spark.createDataFrame([(2, "b2")], "k long, val string"))
    spark.dataSource.register(BucketTableChangeFeedSource)
    stream = spark.readStream.format("buckettable-cdf").option("path", p).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("cdf_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r.k, r.change_type, r.val) for r in spark.sql("SELECT * FROM cdf_sink").collect())
    # from the initial offset the cumulative feed is the final view as inserts
    assert got == [(1, "insert", "a"), (2, "insert", "b2")]


def test_prune_state_does_not_leak_across_plans(spark, table):
    """One loaded DataFrame, a filtered query then an unfiltered one: the
    second must see the WHOLE table. This is the regression that forced
    pruning to be an explicit option: Spark caches the Python source's
    planned partitions per relation, so pushFilters-driven reader state
    leaked a one-bucket plan into the unfiltered count (caught live in
    the warehouse demo)."""
    df = spark.read.format("buckettable").option("path", table.path).load()
    assert df.where(F.col("k") == 5).count() == 1
    assert df.count() == table.read().count()
    # and interleaving the other way still filters correctly
    assert df.where(F.col("k") == 300).count() == 1
    # the pruned relation can never leak foreign-key rows
    pruned = (
        spark.read.format("buckettable")
        .option("path", table.path)
        .option("key", "5")
        .load()
    )
    assert pruned.count() == 1 and pruned.first().k == 5
