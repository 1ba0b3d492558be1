"""Streaming corpus ingestion: exactly-once deduplicated document intake.

The training-data twin of the temporal-graph sink (streaming/ingest.py):
documents arrive as micro-batches; each batch is deduplicated against
the ENTIRE ingestion history via a persisted fingerprint BucketTable
(bucket-pruned probe — O(batch), never O(history)), surviving documents
append to the corpus as one parquet file per batch, and new fingerprints
upsert into the store. At-least-once delivery becomes exactly-once
corpus growth:

- an applied-batch marker (written LAST) makes redelivered batches
  no-ops;
- a crash between the fingerprint upsert and the marker is self-healing:
  fingerprints carry the batch_id that introduced them, and the probe
  treats rows stamped with the CURRENT batch id as unseen — so the
  re-applied batch recomputes exactly the kept-set its crashed attempt
  computed, rewrites the same output file, and re-upserts the same keys
  (BucketTable upsert is replace-by-key: idempotent).

Scale shape: the fingerprint store shuffles/stores 32-byte digests, not
text; the probe reads only the buckets the batch's fingerprints hash
into; corpus output is append-only parquet (one file set per batch —
compact with sources/layout.compact when small files accumulate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.log import get_logger
from graph_vulcan_assets_spark.sources.bucketstore import BucketTable

_log = get_logger("streaming.corpus_ingest")


def prefix_fingerprint(text_col: str = "text", n_tokens: int = 5):
    """5-token-prefix SHA-256 — the q_dedup_incremental key: catches
    re-crawls differing only in trailing boilerplate."""
    return F.sha2(
        F.concat_ws(" ", F.slice(F.split(F.col(text_col), " "), 1, n_tokens)), 256
    )


class CorpusIngest:
    """foreachBatch sink maintaining (corpus parquet, fingerprint store)."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.corpus_dir = os.path.join(root, "corpus")
        self.store = BucketTable(
            spark, os.path.join(root, "fingerprints"), key_cols=["fp"], n_buckets=n_buckets
        )
        os.makedirs(os.path.join(root, "_applied"), exist_ok=True)
        os.makedirs(self.corpus_dir, exist_ok=True)

    def _applied(self) -> set[int]:
        d = os.path.join(self.root, "_applied")
        return {int(f) for f in os.listdir(d) if f.isdigit()}

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._applied():
            _log.info("batch %d already ingested, skipping (idempotent replay)", batch_id)
            return
        keyed = batch.withColumn("fp", prefix_fingerprint())
        if self.store.commits():
            touched = self.store._touched(keyed)
            # rows stamped with THIS batch id come from a crashed earlier
            # attempt of the same batch — treat them as unseen so the
            # re-apply reproduces the original kept-set
            seen = (
                self.store.read(buckets=touched)
                .where(F.col("batch_id") != F.lit(batch_id))
                .select("fp")
            )
            fresh = keyed.join(seen, "fp", "left_anti")
        else:
            fresh = keyed
        # within-batch first-wins on the stable document key
        w = Window.partitionBy("fp").orderBy("doc_id")
        fresh = (
            fresh.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=True)  # one computation feeds two writes
        )
        # 1. corpus append: a deterministic per-batch path — a re-applied
        # batch overwrites its own partial output, never another batch's
        fresh.drop("fp").write.mode("overwrite").parquet(
            os.path.join(self.corpus_dir, f"batch={batch_id}")
        )
        # 2. fingerprint upsert (replace-by-key: idempotent on re-apply)
        self.store.upsert(
            fresh.select(
                "fp",
                F.col("doc_id").alias("first_doc_id"),
                F.lit(batch_id).alias("batch_id"),
            )
        )
        # 3. marker LAST (commit-after-process)
        with open(os.path.join(self.root, "_applied", str(batch_id)), "w") as f:
            f.write("ok")
        _log.info("batch %d ingested", batch_id)

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.corpus_dir, "batch=*"))

    def run_file_stream(self, input_dir: str, schema, checkpoint_dir: str):
        raw = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )
        return (
            raw.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
