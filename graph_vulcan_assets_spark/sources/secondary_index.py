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

Two recovery paths (round 4):

- A refresh that falls behind the base's version-pruning window
  (keep_versions) gets a loud ValueError from the underlying time-travel
  read (the base records per-commit bucket sets for exactly this) and
  FULL-RESYNCS: rebuild the entry set from the current base and delete
  every stale index row. Silently diffing against a pruned (empty)
  before-image would leak deleted keys into lookups forever.
- A crash after the index commits but before the high-water mark
  advances, followed by the base moving on, would leak the intermediate
  value's entry (the re-run diff's 'before' is the pre-crash value, not
  the one actually indexed). refresh() therefore records its TARGET
  commit before mutating; recovery first re-applies exactly the recorded
  [hwm, target] window (same diff as the crashed attempt — idempotent),
  then proceeds. Both halves of a window apply are idempotent (delete of
  absent entries and re-upsert of present ones are no-ops).

The reference has no index surface (every lookup is an HTTP call); this
is engine generalization in the same family as the read API
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

    def _target_path(self) -> str:
        return os.path.join(self.path, "_refresh_target")

    def _pending_target(self) -> int | None:
        try:
            with open(self._target_path()) as f:
                return int(f.read())
        except (FileNotFoundError, ValueError):
            return None

    def _set_target(self, commit: int) -> None:
        tmp = self._target_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(commit))
        os.replace(tmp, self._target_path())

    def _clear_target(self) -> None:
        try:
            os.remove(self._target_path())
        except FileNotFoundError:
            pass

    # -- maintenance ------------------------------------------------------
    def _full_resync(self, head: int) -> None:
        """Rebuild from the CURRENT base: upsert every live (value, key)
        entry and delete every index row not among them. O(base + index) —
        the recovery path when the incremental window is gone."""
        fresh = self.base.read().select(self.column, *self.base.key_cols)
        fresh = fresh.localCheckpoint(eager=True)
        if self.table._schema is not None:
            stale = self.table.read().join(
                fresh, [self.column, *self.base.key_cols], "left_anti"
            )
            if stale.take(1):
                self.table.delete(stale)
        if fresh.take(1):
            self.table.upsert(fresh)

    def _apply_window(self, last: int, until: int) -> None:
        """Apply the base's [last → until] change feed to the index; falls
        back to a full resync if that window left the retained history."""
        if last < 0:
            # initial build: one pass over the base, no feed needed
            entries = self.base.read(version=until).select(
                self.column, *self.base.key_cols
            )
            if entries.take(1):
                self.table.upsert(entries)
            return
        try:
            feed = self.base.changes(last, until).localCheckpoint(eager=True)
        except ValueError:
            # window pruned away — diffing against a silently-empty
            # before-image would leak deleted keys into lookups forever
            self._full_resync(until)
            return
        stale, fresh = self.delta_plans(feed)
        # delete stale entries first, then add fresh — both idempotent, so
        # a crash anywhere re-runs safely (hwm advances only at the end)
        if stale.take(1):
            self.table.delete(stale)
        if fresh.take(1):
            self.table.upsert(fresh)

    def delta_plans(self, feed: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(stale, fresh) index-entry deltas derived from a base change
        feed, as unexecuted DataFrames (plan-audit surface; the refresh
        path commits them via delete+upsert). Stale = entries whose indexed
        value was deleted or changed away; fresh = inserted or
        changed-to values. Both are narrow projections of the feed — no
        extra shuffle beyond the feed's own bucket-pruned diff."""
        val = lambda side: F.col(side)[self.column]  # noqa: E731
        stale = feed.where(
            (F.col("change_type") == "delete")
            | ((F.col("change_type") == "update") & ~val("before").eqNullSafe(val("after")))
        ).select(val("before").alias(self.column), *self.base.key_cols)
        fresh = feed.where(
            (F.col("change_type") == "insert")
            | ((F.col("change_type") == "update") & ~val("before").eqNullSafe(val("after")))
        ).select(val("after").alias(self.column), *self.base.key_cols)
        return stale, fresh

    def refresh(self) -> int:
        """Bring the index up to the base's head commit; returns it."""
        commits = self.base.commits()
        if not commits:
            return -1
        head = commits[-1]
        last = self.indexed_through()
        # recover an interrupted refresh FIRST: a crashed attempt may have
        # applied part of [last, target] without advancing the hwm; if the
        # base advanced since, a fresh [last, head] diff would compute
        # 'before' values the crashed attempt already replaced and leak
        # the intermediate entries. Re-apply exactly the recorded window
        # (idempotent), commit its hwm, then continue.
        target = self._pending_target()
        if target is not None and target > last:
            self._apply_window(last, target)
            self._save_hwm(target)
            self._clear_target()
            last = target
        if head == last:
            self._clear_target()
            return head
        self._set_target(head)
        self._apply_window(last, head)
        self._save_hwm(head)
        self._clear_target()
        return head

    # -- reads ------------------------------------------------------------
    def lookup(self, value) -> DataFrame:
        """Base keys whose ``column`` equals ``value`` — opens exactly one
        index bucket (the value's), never the base. Before the first
        refresh the index has no entries (and no schema): return a typed
        empty frame instead of an opaque NoneType error."""
        entries = self.table
        if entries._schema is None:
            base_schema = self.base._schema
            if base_schema is None:
                raise ValueError("index not built and base is empty — call refresh()")
            from pyspark.sql.types import StructType

            return self.spark.createDataFrame(
                [], StructType([base_schema[k] for k in self.base.key_cols])
            )
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
