"""Bucketed (co-located) joins — the shuffle-elimination scale pattern.

At 100 TB, the fact-fact join (`lineitem ⋈ orders` on orderkey) dominates
shuffle volume. Bucketing both tables by the join key at write time makes
every subsequent join on that key shuffle-free: matching buckets are read
co-located and joined directly.

No declared query here (bucketed tables need a persisted catalog table,
not a temp view over driver-provided parquet) — `write_bucketed` +
`bucketed_join` are the utility surface, exercised by
tests/test_bucketing.py which asserts the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist a DataFrame as a bucketed managed table (sorted within
    buckets so merge joins skip the sort too). Idempotent: drops any
    previous table AND its leftover location (a crashed run can leave the
    directory behind without catalog metadata)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two bucketed tables on their bucket keys: with matching bucket
    counts Catalyst plans a SortMergeJoin with NO Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
