"""Incremental corpus ingestion: BucketTable as the persisted fingerprint
store behind batch-over-batch dedup — the production composition of
q_dedup_incremental (anti-join vs a fingerprint history) with a store
whose per-ingest write cost is O(batch), not O(history).

Pattern: each arriving batch probes the fingerprint table (bucket-pruned
read on the batch's key hashes), keeps only unseen documents, then
upserts its new fingerprints. Equivalence oracle: after ingesting the
corpus in K batches, the kept set must equal a single-pass global
first-wins dedup.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.sources.bucketstore import BucketTable
from graph_vulcan_assets_spark.tables import load_table

def _keyed(docs):
    fp = F.sha2(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)), 256)
    return docs.select("doc_id", fp.alias("fp"))


def test_batched_ingest_equals_global_dedup(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    keyed = _keyed(docs)

    store = BucketTable(spark, str(tmp_path / "fps"), key_cols=["fp"], n_buckets=8)
    kept = []
    for i in range(4):  # 4 ingest batches, in doc_id order (first wins)
        batch = keyed.where(F.pmod("doc_id", F.lit(4)) == i)
        if store.commits():
            touched = store._touched(batch)
            seen = store.read(buckets=touched).select("fp")
            fresh = batch.join(seen, "fp", "left_anti")
        else:
            fresh = batch
        # within-batch first-wins
        w = Window.partitionBy("fp").orderBy("doc_id")
        fresh = fresh.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
        kept.extend(r["doc_id"] for r in fresh.select("doc_id").collect())
        store.upsert(fresh.select("fp", F.col("doc_id").alias("first_doc_id")))

    # oracle: global first-wins within each batch-arrival order. A doc is
    # kept iff no earlier-batch doc (or same-batch lower doc_id) shares
    # its fingerprint.
    w = Window.partitionBy("fp").orderBy(F.pmod("doc_id", F.lit(4)), "doc_id")
    want = {
        r["doc_id"]
        for r in keyed.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("doc_id")
        .collect()
    }
    assert set(kept) == want
    assert len(kept) < docs.count()  # the prefix key really deduped
    # the store holds exactly one row per distinct fingerprint
    assert store.read().count() == keyed.select("fp").distinct().count()
