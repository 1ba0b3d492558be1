"""Partition-grained backfill: process exactly the source partitions that
haven't been processed yet, idempotently.

The batch-world sibling of the streaming foreachBatch loop: a
Hive-partitioned source (``day=YYYY-MM-DD`` directories) lands partitions
over time — scheduled loads, late re-deliveries, historical backfills —
and the transform must catch up without recomputing finished work and
without double-counting on retry. The unit of progress is the PARTITION:

- ``pending()`` = source partitions minus completion markers;
- each partition processes independently: read one directory (partition
  pruning by construction), apply the transform, overwrite the output
  partition, then write the marker LAST — a crash anywhere re-runs that
  partition, and overwrite + marker-last makes the re-run a no-op
  (same discipline as BucketTable commits and the state sink);
- a re-landed partition (upstream restated a day) re-processes by
  deleting its marker — restatement is an explicit operator action, not
  a silent mtime heuristic;
- a partition is admitted to ``pending()`` only when its landing looks
  COMPLETE: if the upstream writes a ``_SUCCESS`` marker (Spark and most
  lake writers do), that is the signal; otherwise ``settle_seconds``
  holds a partition back until its newest file has been quiet that long.
  Without the guard, a scheduled run firing mid-land would process a
  half-written directory and permanently mark it done — the remaining
  files would never be processed and the output would silently
  undercount that day.

At 100 TB this is the difference between "the nightly job re-reads the
table" and "the nightly job reads last night". The reference has no batch
surface at all (pure streaming consumer); this generalizes its
at-least-once + idempotent-apply contract to scheduled batch.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession


class PartitionBackfill:
    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        out_dir: str,
        transform,
        partition_col: str = "day",
        settle_seconds: float = 0.0,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.out_dir = out_dir
        self.transform = transform
        self.partition_col = partition_col
        self.settle_seconds = settle_seconds
        self._done_dir = os.path.join(out_dir, "_done")
        os.makedirs(self._done_dir, exist_ok=True)

    def _landed(self, partition: str) -> bool:
        """Is this partition's landing complete? ``_SUCCESS`` wins; else
        the newest-file quiet period (``settle_seconds``; 0 = admit as
        soon as the directory exists, the pre-round-4 behavior)."""
        d = os.path.join(self.source_dir, f"{self.partition_col}={partition}")
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            return True
        if self.settle_seconds <= 0:
            return True
        try:
            newest = max(
                (os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)),
                default=0.0,
            )
        except OSError:
            return False
        return (time.time() - newest) >= self.settle_seconds

    def _source_partitions(self) -> list[str]:
        prefix = f"{self.partition_col}="
        return sorted(
            d.removeprefix(prefix)
            for d in os.listdir(self.source_dir)
            if d.startswith(prefix)
        )

    def processed(self) -> set[str]:
        return set(os.listdir(self._done_dir))

    def pending(self) -> list[str]:
        done = self.processed()
        return [
            p
            for p in self._source_partitions()
            if p not in done and self._landed(p)
        ]

    def invalidate(self, partition: str) -> None:
        """Mark a partition for re-processing (upstream restatement)."""
        try:
            os.remove(os.path.join(self._done_dir, partition))
        except FileNotFoundError:
            pass

    def run(self) -> list[str]:
        """Process every pending partition; returns the ones processed."""
        ran = []
        for p in self.pending():
            src = os.path.join(self.source_dir, f"{self.partition_col}={p}")
            out = os.path.join(self.out_dir, f"{self.partition_col}={p}")
            df = self.spark.read.parquet(src)
            self.transform(df).write.mode("overwrite").parquet(out)
            with open(os.path.join(self._done_dir, p), "w") as f:
                f.write("ok")
            ran.append(p)
        return ran

    def read_output(self) -> DataFrame:
        # base-dir read: Spark partition discovery re-attaches the
        # partition column; the _done marker dir is skipped automatically
        # (leading-underscore paths are invisible to discovery)
        return self.spark.read.parquet(self.out_dir)
