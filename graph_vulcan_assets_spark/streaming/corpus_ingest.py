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

from graph_vulcan_assets_spark.llm.dedup import prefix_fingerprint
from graph_vulcan_assets_spark.log import get_logger
from graph_vulcan_assets_spark.sources.bucketstore import BucketTable

_log = get_logger("streaming.corpus_ingest")


class CorpusIngest:
    """foreachBatch sink maintaining (corpus parquet, fingerprint store).

    Batch identity is (stream namespace, batch id), NOT the bare batch
    id: foreachBatch batch ids restart at 0 with a fresh checkpoint, so
    a bare-id marker would make a re-checkpointed stream silently SKIP
    its first batches as "already ingested" (and its crash-heal stamp
    would collide with the old stream's). The namespace derives from the
    checkpoint path (``run_file_stream``); direct ``apply_batch`` callers
    get the 'default' namespace.
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.ns = "default"
        self.corpus_dir = os.path.join(root, "corpus")
        self.store = BucketTable(
            spark, os.path.join(root, "fingerprints"), key_cols=["fp"], n_buckets=n_buckets
        )
        os.makedirs(os.path.join(root, "_applied"), exist_ok=True)
        os.makedirs(self.corpus_dir, exist_ok=True)

    def _applied(self) -> set[str]:
        return set(os.listdir(os.path.join(self.root, "_applied")))

    def _stamp(self, batch_id: int) -> str:
        return f"{self.ns}-{batch_id}"

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        stamp = self._stamp(batch_id)
        if stamp in self._applied():
            _log.info("batch %s already ingested, skipping (idempotent replay)", stamp)
            return
        # eager checkpoint BEFORE the bucket probe: _touched collects over
        # keyed, and the dedup pipeline reuses it — without this the batch
        # is fingerprinted (sha2 over full text) twice per application
        keyed = batch.withColumn("fp", prefix_fingerprint()).localCheckpoint(eager=True)
        if self.store.commits():
            touched = self.store._touched(keyed)
            # rows stamped with THIS (namespace, batch) come from a crashed
            # earlier attempt of the same batch — treat them as unseen so
            # the re-apply reproduces the original kept-set
            seen = (
                self.store.read(buckets=touched)
                .where(F.col("batch_id") != F.lit(stamp))
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
        # 1. corpus append: a deterministic per-(namespace, batch) path —
        # a re-applied batch overwrites its own partial output, never
        # another batch's (or another stream's batch 0)
        fresh.drop("fp").write.mode("overwrite").parquet(
            os.path.join(self.corpus_dir, f"batch={stamp}")
        )
        # 2. fingerprint upsert (replace-by-key: idempotent on re-apply)
        self.store.upsert(
            fresh.select(
                "fp",
                F.col("doc_id").alias("first_doc_id"),
                F.lit(stamp).alias("batch_id"),
            )
        )
        # 3. marker LAST (commit-after-process)
        with open(os.path.join(self.root, "_applied", stamp), "w") as f:
            f.write("ok")
        _log.info("batch %s ingested", stamp)

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.corpus_dir, "batch=*"))

    def run_file_stream(self, input_dir: str, schema, checkpoint_dir: str):
        import hashlib

        # namespace = checkpoint identity: batch ids are only meaningful
        # within one checkpoint's lineage
        self.ns = hashlib.sha256(
            os.path.abspath(checkpoint_dir).encode()
        ).hexdigest()[:12]
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
