"""Write-side data layout: partitioned, range-clustered, sorted parquet.

At 100 TB the write layout IS the read performance: Hive-style partition
directories enable partition pruning (whole directories skipped at
planning time), range-clustering by a secondary key gives each file a
narrow min/max band so row-group statistics skip almost everything else,
and in-file sort keeps row groups internally clustered. This module is the
sink-side complement to the scan-side guarantees tests pin in
tests/test_plans.py (PushedFilters / ReadSchema).

The reference's only sink is the graph store API (one HTTP call per
mutation, cmd/graph-vulcan-assets/main.go); lake-layout writes are part of
the engine's generalization, sized for Spark:

- ``partition_by`` — LOW-cardinality columns only (each value is a
  directory; thousands of values = small-file explosion).
- ``cluster_by`` — ``repartitionByRange``: one task per output file per
  partition-value range, so file count is controlled by the repartition
  width, not by input partitioning.
- ``sort_by`` — ``sortWithinPartitions``; never a global ``orderBy``
  (a single-partition total sort is the classic write-path bottleneck).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    cluster_by: list[str],
    n_files_per_partition: int = 4,
) -> None:
    """Write Hive-partitioned parquet, range-clustered and sorted by
    ``cluster_by`` inside each partition directory.

    The range partitioning deliberately ignores ``partition_by``: the
    directory split happens at write time anyway, and ranging on the
    cluster key ALONE guarantees every task (hence every file, in every
    directory) holds a narrow band of the cluster key. Ranging jointly on
    (partition, cluster) would let a range boundary hand one task an
    entire partition-value's full key range — full-width files with no
    statistics-skipping value."""
    clustered = df.repartitionByRange(
        n_files_per_partition, *cluster_by
    ).sortWithinPartitions(*partition_by, *cluster_by)
    clustered.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a clustered layout (partition columns become real columns)."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Z-order (multi-dimensional) clustering
# ---------------------------------------------------------------------------

ZBITS = 16  # bits per dimension; 2 dims fit a 32-bit z-key, 4 dims 64-bit


def zorder_key(dims: list[tuple[str, float, float]], bits: int = ZBITS) -> Column:
    """Bit-interleaved Z-order key over fixed-domain numeric columns.

    ``dims`` is ``[(column, domain_lo, domain_hi), ...]``; the domain is
    part of the LAYOUT SPEC (like the equi-width histogram bounds), not
    derived from the data — so the key is a pure per-row expression, the
    write stays one-pass, and re-writing a partition never changes the
    key of untouched rows.

    Each column is normalized to a ``bits``-bit integer rank, then bit j
    of dimension k lands at position ``j * len(dims) + k`` — the standard
    Morton interleave. Linear (single-key) range clustering gives narrow
    per-file bands on ONE column and full-width bands on every other;
    the Z-curve splits the span budget evenly: with F files, each file
    covers ~F^(-1/d) of EVERY dimension's range, so min/max row-group
    statistics skip files for predicates on ANY clustered dimension.
    All pure JVM-side integer expressions (whole-stage codegen), no UDF.
    """
    d = len(dims)
    top = (1 << bits) - 1
    z: Column | None = None
    for k, (col, lo, hi) in enumerate(dims):
        clamped = F.least(
            F.greatest((F.col(col).cast("double") - F.lit(float(lo)))
                       / F.lit(float(hi) - float(lo)), F.lit(0.0)),
            F.lit(1.0),
        )
        rank = F.floor(clamped * top).cast("long")
        for j in range(bits):
            bit = F.shiftleft(
                F.shiftright(rank, j).bitwiseAND(F.lit(1)), j * d + k
            )
            z = bit if z is None else z.bitwiseOR(bit)
    assert z is not None
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[tuple[str, float, float]],
    n_files: int = 16,
    partition_by: list[str] | None = None,
) -> None:
    """Write parquet clustered on the Z-order curve of ``dims``.

    ``repartitionByRange`` on the z-key cuts the curve into ``n_files``
    contiguous segments (one task = one file = one curve segment), and the
    within-file sort keeps row groups internally clustered, so EVERY
    ``dims`` column gets narrow per-file and per-row-group min/max bands.
    The ``_zkey`` column is persisted as the clustering index — harmless
    to readers, and lets an engine range-prune on the curve directly.
    """
    keyed = df.withColumn("_zkey", zorder_key(dims))
    # partition columns must LEAD the within-partition sort: a dynamic-
    # partition write re-sorts each task by the partition columns alone,
    # which scrambles a bare _zkey order and silently defeats the
    # row-group clustering this function promises (same discipline as
    # write_clustered; verified file-by-file in tests/test_layout.py)
    sort_cols = [*(partition_by or []), "_zkey"]
    clustered = keyed.repartitionByRange(n_files, "_zkey").sortWithinPartitions(
        *sort_cols
    )
    w = clustered.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Compact a small-file parquet directory into ~target-sized files.

    The small-file problem is the slow death of streaming lake sinks: every
    micro-batch writes a file per task, and a year later the table is a
    million 100 KB files whose open/footer costs dwarf the scan. Compaction
    rewrites the data as ceil(bytes / target) files — file count derives
    from DATA SIZE, not from the input's partitioning or the cluster's core
    count (a bare ``coalesce(1)``-style rewrite would serialize the write
    through one task; ``repartition(cores)`` would re-fragment a small
    table across 32 files).

    Returns the number of files written. ``sort_by`` re-sorts rows within
    each output file so row-group min/max bands stay narrow after
    compaction (compaction that interleaves rows destroys the clustering
    the layout writer established).

    At cluster scale this runs per partition-directory with the same
    arithmetic; the one-shuffle rewrite is the whole cost, which is why
    real lake formats gate it on a small-file-count threshold rather than
    running it every batch.
    """
    import math
    import os

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_by])
        out = out.sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    return n_files
