"""Secondary index over a BucketTable column, maintained from its change
feed — "indexes are just maintained views over the CDF".

A BucketTable answers key lookups in one bucket; a predicate on any OTHER
column still scans every bucket. The index is itself a BucketTable whose
rows are (indexed value, *base key), keyed by the full pair for identity
but BUCKETED BY THE VALUE alone (the bucket_cols ⊂ key_cols layout), so
``lookup(value)`` opens exactly one bucket however large base and index
grow.

Maintenance is incremental: ``refresh()`` consumes ``base.changes(last
indexed commit → head)`` — the bucket-pruned row diff — and turns it into
index deletes (stale value → key entries) and upserts (new entries). Work
per refresh is O(changed rows), never O(base). The high-water mark is
persisted marker-style AFTER both index commits; a crash mid-refresh
re-runs the same diff, and both halves are idempotent (delete of absent
entries and re-upsert of present ones are no-ops).

Constraint inherited from the CDF: refresh must run within the base's
version-pruning window (keep_versions); a refresh that falls behind it
raises from the underlying time-travel read rather than silently missing
changes. The reference has no index surface (every lookup is an HTTP
call); this is engine generalization in the same family as the read API
(plans/api.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.sources.bucketstore import BucketTable


class SecondaryIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base: BucketTable,
        column: str,
        n_buckets: int = 16,
    ):
        if column in base.key_cols:
            raise ValueError("indexing a key column is useless — keys already prune")
        self.spark = spark
        self.path = path
        self.base = base
        self.column = column
        self.table = BucketTable(
            spark,
            os.path.join(path, "entries"),
            key_cols=[column, *base.key_cols],
            n_buckets=n_buckets,
            bucket_cols=[column],
        )

    # -- high-water mark --------------------------------------------------
    def _hwm_path(self) -> str:
        return os.path.join(self.path, "_indexed_through")

    def indexed_through(self) -> int:
        try:
            with open(self._hwm_path()) as f:
                return int(f.read())
        except FileNotFoundError:
            return -1

    def _save_hwm(self, commit: int) -> None:
        tmp = self._hwm_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(commit))
        os.replace(tmp, self._hwm_path())

    # -- maintenance ------------------------------------------------------
    def refresh(self) -> int:
        """Bring the index up to the base's head commit; returns it."""
        commits = self.base.commits()
        if not commits:
            return -1
        head = commits[-1]
        last = self.indexed_through()
        if head == last:
            return head
        if last < 0:
            # initial build: one pass over the base, no feed needed
            entries = self.base.read().select(self.column, *self.base.key_cols)
            self.table.upsert(entries)
            self._save_hwm(head)
            return head
        feed = self.base.changes(last, head).localCheckpoint(eager=True)
        val = lambda side: F.col(side)[self.column]  # noqa: E731
        stale = feed.where(
            (F.col("change_type") == "delete")
            | ((F.col("change_type") == "update") & ~val("before").eqNullSafe(val("after")))
        ).select(val("before").alias(self.column), *self.base.key_cols)
        fresh = feed.where(
            (F.col("change_type") == "insert")
            | ((F.col("change_type") == "update") & ~val("before").eqNullSafe(val("after")))
        ).select(val("after").alias(self.column), *self.base.key_cols)
        # delete stale entries first, then add fresh — both idempotent, so
        # a crash anywhere re-runs safely (hwm advances only at the end)
        if stale.take(1):
            self.table.delete(stale)
        if fresh.take(1):
            self.table.upsert(fresh)
        self._save_hwm(head)
        return head

    # -- reads ------------------------------------------------------------
    def lookup(self, value) -> DataFrame:
        """Base keys whose ``column`` equals ``value`` — opens exactly one
        index bucket (the value's), never the base."""
        entries = self.table
        col_type = entries._schema[self.column].dataType.simpleString()
        keyed = self.spark.createDataFrame([(value,)], f"{self.column} {col_type}")
        buckets = entries._touched(keyed)
        return (
            entries.read(buckets=buckets)
            .where(F.col(self.column) == F.lit(value))
            .select(*self.base.key_cols)
        )

    def lookup_rows(self, value) -> DataFrame:
        """Full base rows for ``value``: index probe → bucket-pruned base
        read on the resolved keys."""
        keys = self.lookup(value).localCheckpoint(eager=True)
        base_buckets = self.base._touched(keys)
        return self.base.read(buckets=base_buckets).join(keys, self.base.key_cols)
