"""Streaming corpus ingestion: exactly-once deduplicated intake over the
BucketTable fingerprint store (streaming/corpus_ingest.py)."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.streaming.corpus_ingest import (
    CorpusIngest,
    prefix_fingerprint,
)
from graph_vulcan_assets_spark.tables import load_table


def _global_first_wins(docs, n_batches):
    """Oracle: doc kept iff no doc in an earlier batch (or same batch with
    lower doc_id) shares its prefix fingerprint."""
    keyed = docs.withColumn("fp", prefix_fingerprint())
    w = Window.partitionBy("fp").orderBy(F.pmod("doc_id", F.lit(n_batches)), "doc_id")
    return {
        r["doc_id"]
        for r in keyed.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("doc_id")
        .collect()
    }


def test_streamed_ingest_equals_global_dedup(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    for i in range(3):
        docs.where(F.pmod("doc_id", F.lit(3)) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")

    ingest = CorpusIngest(spark, str(tmp_path / "store"), n_buckets=8)
    q = ingest.run_file_stream(src + "/b*", docs.schema, str(tmp_path / "ckpt"))
    assert q.awaitTermination(300), "ingest stream did not finish"

    got = {r["doc_id"] for r in ingest.corpus().select("doc_id").collect()}
    assert got == _global_first_wins(docs, 3)
    assert 0 < len(got) < docs.count()  # dedup really dropped something


def test_redelivered_batch_is_noop(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    ingest = CorpusIngest(spark, str(tmp_path / "store"), n_buckets=8)
    b0 = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    b1 = docs.where(F.pmod("doc_id", F.lit(2)) == 1)
    ingest.apply_batch(b0, 0)
    ingest.apply_batch(b1, 1)
    before = sorted(r["doc_id"] for r in ingest.corpus().select("doc_id").collect())
    n_commits = len(ingest.store.commits())

    ingest.apply_batch(b1, 1)  # duplicate delivery
    after = sorted(r["doc_id"] for r in ingest.corpus().select("doc_id").collect())
    assert after == before
    assert len(ingest.store.commits()) == n_commits  # no phantom commit


def test_crash_after_upsert_before_marker_self_heals(spark, sf_dir, tmp_path):
    """The hard ALO case: fingerprints committed, marker lost. The
    redelivered batch must treat its own fingerprints as unseen and
    reproduce the identical kept-set — no data loss, no duplicates."""
    docs = load_table(spark, sf_dir, "documents").limit(300)
    ingest = CorpusIngest(spark, str(tmp_path / "store"), n_buckets=8)
    b0 = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    b1 = docs.where(F.pmod("doc_id", F.lit(2)) == 1)
    ingest.apply_batch(b0, 0)
    ingest.apply_batch(b1, 1)
    expected = sorted(r["doc_id"] for r in ingest.corpus().select("doc_id").collect())

    # crash: everything of batch 1 persisted EXCEPT the marker
    os.remove(os.path.join(str(tmp_path / "store"), "_applied", ingest._stamp(1)))
    ingest.apply_batch(b1, 1)  # redelivery
    got = sorted(r["doc_id"] for r in ingest.corpus().select("doc_id").collect())
    assert got == expected
    # store is consistent: one row per distinct fingerprint of the corpus
    n_fp = (
        docs.withColumn("fp", prefix_fingerprint()).select("fp").distinct().count()
    )
    assert ingest.store.read().count() == n_fp


def test_fresh_checkpoint_does_not_skip_or_collide(spark, sf_dir, tmp_path):
    """Round-4 fix: markers were keyed by bare batch_id, so a stream
    restarted with a NEW checkpoint (batch ids restart at 0) silently
    skipped its first batches as 'already ingested' and its crash-heal
    stamp collided with the old stream's batch 0. Batch identity is now
    (checkpoint namespace, batch id): the second stream must ingest its
    new documents AND still dedup against the first stream's corpus."""
    docs = load_table(spark, sf_dir, "documents").limit(200).localCheckpoint(eager=True)
    first = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    second = docs  # includes first's docs (dupes) + the odd half (new)

    root = str(tmp_path / "store")
    ingest = CorpusIngest(spark, root, n_buckets=8)

    src1 = str(tmp_path / "in1")
    first.coalesce(1).write.parquet(src1 + "/b0")
    q = ingest.run_file_stream(src1 + "/b*", docs.schema, str(tmp_path / "ckpt1"))
    assert q.awaitTermination(180)
    n_first = ingest.corpus().count()
    assert n_first > 0

    # brand-new checkpoint: batch ids restart at 0
    ingest2 = CorpusIngest(spark, root, n_buckets=8)
    src2 = str(tmp_path / "in2")
    second.coalesce(1).write.parquet(src2 + "/b0")
    q2 = ingest2.run_file_stream(src2 + "/b*", docs.schema, str(tmp_path / "ckpt2"))
    assert q2.awaitTermination(180)

    got = sorted(r["doc_id"] for r in ingest2.corpus().select("doc_id").collect())
    # every fingerprint ingested exactly once across both streams, keeper
    # chosen stream-arrival-first: stream 1 saw the evens, so an even doc
    # wins its fingerprint group; a fingerprint whose docs are all odd is
    # ingested by stream 2 with its lowest doc_id. No skips, no dupes.
    keyed = docs.withColumn("fp", prefix_fingerprint())
    groups = {}
    for r in keyed.select("doc_id", "fp").collect():
        groups.setdefault(r.fp, []).append(r.doc_id)
    want = sorted(
        min([d for d in ds if d % 2 == 0], default=None)
        if any(d % 2 == 0 for d in ds)
        else min(ds)
        for ds in groups.values()
    )
    assert got == want
    assert len(got) < docs.count()  # non-vacuous: dedup really collapsed
