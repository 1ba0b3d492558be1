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

from pyspark.sql import DataFrame, SparkSession


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
