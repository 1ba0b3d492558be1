"""Write-side layout: partition pruning + row-group skipping must be real.

These tests prove the LAYOUT does what the docstring claims: a filter on
the partition column compiles to a PartitionFilter (directories skipped at
planning time, not row-filtered), the clustered files carry narrow min/max
bands on the cluster key, and the round trip loses nothing.
"""

from __future__ import annotations

import contextlib
import io

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.sources import layout
from graph_vulcan_assets_spark.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_filter_reaches_planning(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_layout")
    layout.write_clustered(
        events, out, partition_by=["event_type"], cluster_by=["user_id"]
    )
    back = layout.read_pruned(spark, out)
    q = back.where(F.col("event_type") == "purchase").where(F.col("user_id") < 10)
    p = _plan(q)
    # the partition predicate must prune directories, not filter rows
    assert "PartitionFilters" in p
    assert "event_type" in p.split("PartitionFilters", 1)[1].splitlines()[0]
    # the cluster-key predicate must push to the parquet reader
    pushed = [l for l in p.splitlines() if "PushedFilters" in l][0]
    assert "LessThan(user_id,10)" in pushed


def test_round_trip_is_lossless(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    out = str(tmp_path / "events_rt")
    layout.write_clustered(
        events, out, partition_by=["event_type"], cluster_by=["user_id"]
    )
    back = layout.read_pruned(spark, out).select(
        "event_id", "event_type", "user_id", "value"
    )
    assert back.count() == events.count()
    assert (
        back.agg(F.sum("event_id")).collect()[0][0]
        == events.agg(F.sum("event_id")).collect()[0][0]
    )


def test_cluster_key_bands_are_narrow(spark, sf_dir, tmp_path):
    """Range clustering must give each file a min/max band on the cluster
    key much narrower than the global range — that's what row-group
    statistics skipping buys at scale."""
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_bands")
    layout.write_clustered(
        events, out, partition_by=["event_type"], cluster_by=["user_id"]
    )
    lo, hi = events.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    global_span = hi - lo
    import glob

    files = glob.glob(out + "/*/*.parquet")
    assert len(files) > 1
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "user_id"
        )
        f_lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        f_hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append(f_hi - f_lo)
    # every file covers a strict sub-band; on average far below the range
    assert max(spans) < global_span
    assert sum(spans) / len(spans) <= global_span / 2


def test_dynamic_partition_pruning_on_dim_join(spark, sf_dir, tmp_path):
    """Joining the partitioned fact with a filtered dimension must prune
    fact partitions at RUNTIME from the dim side's surviving join keys
    (dynamicpruningexpression in PartitionFilters) — the star-schema scan
    killer at 100 TB: only the joined-to partition directories are read."""
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_dpp")
    layout.write_clustered(
        events, out, partition_by=["event_type"], cluster_by=["user_id"]
    )
    fact = layout.read_pruned(spark, out)
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("is_conversion", F.col("event_type").isin("purchase", "signup"))
    )
    q = (
        fact.join(dim.where(F.col("is_conversion")), "event_type")
        .groupBy("event_type")
        .count()
    )
    p = _plan(q)
    assert "dynamicpruningexpression" in p.lower()
    pf = p.split("PartitionFilters", 1)[1].splitlines()[0]
    assert "dynamicpruning" in pf


def _file_spans(files: list[str], column: str) -> list[float]:
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == column
        )
        f_lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        f_hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append(f_hi - f_lo)
    return spans


def test_zorder_bands_are_narrow_on_both_dims(spark, sf_dir, tmp_path):
    """Z-order clustering must give every file a narrow min/max band on
    BOTH clustered dimensions — that's the whole point of the curve: a
    linear sort on key A leaves key B full-width in every file (proven
    here as the control), so only A-predicates skip files; the Z-layout
    lets parquet statistics skip files for predicates on either key."""
    import glob

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    lo_p, hi_p, lo_s, hi_s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]

    zdir = str(tmp_path / "li_zorder")
    layout.write_zordered(
        li, zdir, dims=[("l_partkey", lo_p, hi_p), ("l_suppkey", lo_s, hi_s)],
        n_files=16,
    )
    zfiles = glob.glob(zdir + "/*.parquet")
    assert len(zfiles) >= 8

    lindir = str(tmp_path / "li_linear")
    layout.write_clustered(li, lindir, partition_by=[], cluster_by=["l_partkey"],
                           n_files_per_partition=16)
    lfiles = glob.glob(lindir + "/*.parquet")

    span_p, span_s = hi_p - lo_p, hi_s - lo_s
    z_p = _file_spans(zfiles, "l_partkey")
    z_s = _file_spans(zfiles, "l_suppkey")
    lin_s = _file_spans(lfiles, "l_suppkey")

    # 16 files over a 2-d curve: each file covers ~1/4 of each dim
    assert sum(z_p) / len(z_p) <= span_p / 2
    assert sum(z_s) / len(z_s) <= span_s / 2
    # control: linear clustering leaves the secondary dim full-width
    assert sum(lin_s) / len(lin_s) > span_s * 0.8


def test_zorder_key_is_codegen_expression(spark, sf_dir):
    """The z-key must be a pure JVM expression (no UDF, no Python stage)."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.withColumn(
        "_zkey", layout.zorder_key([("l_partkey", 0, 199), ("l_suppkey", 0, 9)])
    )
    p = _plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # formatted plans mark codegen stages with a leading '*'
    assert "* Project" in p


def test_compaction_merges_small_files(spark, sf_dir, tmp_path):
    """Compaction must (1) size file count from data bytes, not input
    fragmentation or core count, (2) lose nothing, (3) restore narrow
    min/max bands when re-sorted."""
    import glob

    events = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "fragmented")
    events.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    n = layout.compact(spark, frag, out, target_file_bytes=10**9, sort_by=["user_id"])
    files = glob.glob(f"{out}/*.parquet")
    assert n == 1 and len(files) == 1  # tiny table → one file, not 64, not 32

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert (
        back.agg(F.sum("event_id")).collect()[0][0]
        == events.agg(F.sum("event_id")).collect()[0][0]
    )

    # multi-file path: force several files and check disjoint user_id bands
    import os

    total = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    out2 = str(tmp_path / "compacted4")
    n2 = layout.compact(spark, frag, out2, target_file_bytes=total // 3, sort_by=["user_id"])
    files2 = sorted(glob.glob(f"{out2}/*.parquet"))
    assert n2 == len(files2) > 1
    bands = []
    for f in files2:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        st = md.row_group(0).column(names["user_id"]).statistics
        mn, mx = st.min, st.max
        for rg in range(1, md.num_row_groups):
            s = md.row_group(rg).column(names["user_id"]).statistics
            mn, mx = min(mn, s.min), max(mx, s.max)
        bands.append((mn, mx))
    bands.sort()
    for (_, hi), (lo, _) in zip(bands, bands[1:]):
        assert hi <= lo  # range-partitioned: consecutive files don't interleave


def test_zordered_partitioned_write_keeps_zkey_sorted_per_file(spark, tmp_path):
    """Round-4 fix: with partition_by, the dynamic-partition write used to
    re-sort each task by the partition columns alone, scrambling _zkey
    inside every file — full-width row-group min/max bands, statistics
    skipping defeated. Partition columns must lead the sort."""
    import glob

    import pyarrow.parquet as pq

    from graph_vulcan_assets_spark.sources.layout import write_zordered
    from graph_vulcan_assets_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "z")
    write_zordered(
        e,
        out,
        dims=[("user_id", 0.0, 1000.0), ("value", 0.0, 500.0)],
        n_files=4,
        partition_by=["event_type"],
    )
    files = glob.glob(out + "/event_type=*/*.parquet")
    assert files, "no partitioned output files"
    for f in files:
        zk = pq.read_table(f, columns=["_zkey"]).column("_zkey").to_pylist()
        assert zk == sorted(zk), f"_zkey not sorted within {f}"
