"""Slowly-changing-dimension type 2: build + incremental apply.

The reference's asset store keeps exactly one live row per key and expires
the old one on change (inventory/inventory.go upsert path) — SCD type 1.
The type-2 form keeps the full validity history as (valid_from, valid_to]
intervals, which is what a warehouse needs to answer "what was this
attribute AT time t" without replaying the event log. The repo already has
the replay/point-in-time machinery (plans/temporal.py, q_valid_at); this
module is the dimension-table materialization of the same idea:

- ``scd2_build``: batch rebuild from the full event history. Consecutive
  equal attribute values COLLAPSE into one version (a re-assertion of the
  same value is not a change) — one window pass to detect changes, one to
  chain valid_to = next change's valid_from. Both windows share the same
  (user_id) partitioning and (ts, event_id) ordering, so Catalyst plans a
  single shuffle + sort reused by both WindowExecs.
- ``scd2_apply``: incremental micro-batch form. Only TOUCHED keys
  recompute (current row + new events re-collapsed); closed history rows
  and untouched keys pass through unchanged. O(batch + touched keys'
  current rows), never O(dimension) — the same touched-key discipline as
  the streaming state sink (streaming/ingest.py).

Determinism: same-timestamp events order by event_id (the repo-wide
tie-break, matching the replay interpreter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table, plausible_times, plausible_ts_sql


def _collapse(events: DataFrame) -> DataFrame:
    """(user_id, attr, valid_from, valid_to, is_current) from
    (user_id, event_type, ts, event_id): keep only rows where the value
    changes, then chain intervals with lead().

    Zero-width versions are dropped: two changes sharing one timestamp
    give every but the LAST same-ts row valid_to == valid_from — an
    interval containing no time point, invisible to every [from, to)
    point query, and a duplicate (user_id, valid_from) history key that
    would violate BucketTable.upsert's key-unique precondition (history
    content would then depend on replay order). Dropping them keeps
    (user_id, valid_from) unique by construction."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    return (
        changes.select(
            "user_id",
            F.col("event_type").alias("attr"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .where(F.col("valid_to").isNull() | (F.col("valid_to") != F.col("valid_from")))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_build(events: DataFrame) -> DataFrame:
    """Batch SCD2 dimension from an event log."""
    return _collapse(events.select("user_id", "event_type", "ts", "event_id"))


def _rebuild_touched(current_rows: DataFrame, batch: DataFrame) -> DataFrame:
    """Re-collapse the touched keys' timelines: their current dimension
    rows re-enter as pseudo-events (event_id = -1 sorts them first, valid
    under the no-late-data contract) unioned with the batch events."""
    cur_seed = current_rows.select(
        "user_id",
        F.col("attr").alias("event_type"),
        F.col("valid_from").alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    return _collapse(
        cur_seed.unionByName(batch.select("user_id", "event_type", "ts", "event_id"))
    )


def scd2_apply(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """Apply a micro-batch of events (all strictly later than every
    touched key's current valid_from) to an existing SCD2 dimension.

    Touched keys re-collapse from (their current row as a pseudo-event) ∪
    (their batch events); history rows (is_current = false) and untouched
    keys stream through without recompute, so the incremental cost tracks
    the batch, not the dimension.
    """
    touched = batch.select("user_id").distinct()
    rebuilt = _rebuild_touched(dim.where("is_current").join(touched, "user_id"), batch)
    untouched = dim.join(touched, "user_id", "left_anti")
    history = dim.where(~F.col("is_current")).join(touched, "user_id", "left_semi")
    return untouched.unionByName(history).unionByName(rebuilt)


@query(
    "q_scd2_build",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE ts IS NOT NULL AND {plausible_ts_sql()}),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered WHERE prev IS NULL OR prev <> event_type),
    chained AS (
      SELECT user_id,
             event_type AS attr,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM changes)
    SELECT user_id, attr, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM chained
    WHERE valid_to IS NULL OR valid_to <> valid_from
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension over events: one row per (user, attribute-run),
    validity chained, consecutive re-assertions collapsed."""
    # NULL event-times cannot be ordered into a version chain (and sort
    # NULLS FIRST in Spark vs NULLS LAST in DuckDB) — excluded on both sides
    e = plausible_times(load_table(spark, sf_dir, "events")).where(
        F.col("ts").isNotNull()
    )
    return scd2_build(e)


class Scd2Store:
    """Persisted, incrementally-maintained SCD2 dimension over two
    BucketTables (sources/bucketstore.py) — the streaming face of
    ``scd2_apply``.

    Split by mutability, which is what makes every write O(batch):

    - ``current``: one live row per key, keyed by user_id — the only rows
      an incoming batch ever needs to READ, found via bucket-pruned reads
      on the batch's own keys;
    - ``history``: closed rows, keyed by (user_id, valid_from). A closed
      row never changes again, so re-upserting it on an at-least-once
      redelivery is a byte-identical no-op.

    Crash contract (same marker-last discipline as the state sink): apply
    commits history FIRST, then current. A crash between the two leaves
    the old current row in place, so re-applying the same batch re-derives
    the SAME rebuilt rows — the duplicate history upsert is idempotent and
    the current upsert completes. Pinned by tests/test_scd.py.
    """

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        from graph_vulcan_assets_spark.sources.bucketstore import BucketTable

        self.spark = spark
        self.current = BucketTable(
            spark, f"{path}/current", key_cols=["user_id"], n_buckets=n_buckets
        )
        self.history = BucketTable(
            spark,
            f"{path}/history",
            key_cols=["user_id", "valid_from"],
            n_buckets=n_buckets,
        )

    _DIM_SCHEMA = (
        "user_id long, attr string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean"
    )

    def _current_of(self, touched_keys: DataFrame) -> DataFrame:
        if not self.current.commits():
            return self.spark.createDataFrame([], self._DIM_SCHEMA)
        buckets = self.current._touched(touched_keys)
        return self.current.read(buckets=buckets).join(touched_keys, "user_id")

    def apply(self, batch: DataFrame) -> None:
        """Fold one micro-batch of (user_id, event_type, ts, event_id)
        into the dimension. Reads only the touched keys' current-row
        buckets; writes only the touched keys' rows."""
        touched = batch.select("user_id").distinct().localCheckpoint(eager=True)
        rebuilt = _rebuild_touched(self._current_of(touched), batch).localCheckpoint(
            eager=True
        )
        closed = rebuilt.where(~F.col("is_current"))
        self.history.upsert(closed)
        self.current.upsert(rebuilt.where("is_current"))

    def read(self) -> DataFrame:
        cur = (
            self.current.read()
            if self.current.commits()
            else self.spark.createDataFrame([], self._DIM_SCHEMA)
        )
        if not self.history.commits():
            return cur
        return self.history.read().unionByName(cur)


def run_scd2_stream(
    store: Scd2Store, input_dir: str, schema, checkpoint_dir: str
):
    """Maintain the Scd2Store from a file stream via foreachBatch — one
    ``apply`` per micro-batch, checkpointed, availableNow. The store's
    redelivery idempotence (apply of a re-run batch is a no-op) is what
    makes the at-least-once foreachBatch contract safe here, exactly as
    in CorpusIngest (streaming/corpus_ingest.py)."""
    raw = (
        store.spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.apply(batch_df.select("user_id", "event_type", "ts", "event_id"))

    return (
        raw.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
