"""Event-sourced asset history (SCD2) — time travel beyond the reference.

The reference's `valid_at` filters the CURRENT row's interval
(inventory/inventory.go:173-193): after a resurrection, past expiry windows
are invisible. This module keeps the full version history — one row per
state change with a [valid_from, valid_to) validity interval — so
`assets_as_of(history, t)` answers "what did the graph look like at t"
exactly, for any t.

Built on the replay's shared guard derivation (plans.temporal.
derive_guard_frames), so the expiry semantics exist in exactly one place.
All windows partition by the asset key — one shuffle, scales with history
size per asset.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.plans.temporal import (
    UNEXPIRED,
    derive_guard_frames,
    events_from_decoded,
)


def asset_history(decoded: DataFrame) -> DataFrame:
    """Version table: one row per asset state change.

    Columns: type, identifier, valid_from, valid_to (NULL for the current
    version; half-open [valid_from, valid_to)), first_seen, last_seen,
    expiration, expired — the attribute values AS OF that version.
    """
    ev = events_from_decoded(decoded)
    g = derive_guard_frames(ev)

    touches = ev["asset_refresh"].withColumn("kind", F.lit("refresh")).unionByName(
        g["guarded_expire"].withColumn("kind", F.lit("expire"))
    )
    wk = Window.partitionBy("asset_type", "identifier").orderBy("seq")
    wall = Window.partitionBy("asset_type", "identifier")
    return touches.select(
        F.col("asset_type").alias("type"),
        "identifier",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wk).alias("valid_to"),
        F.min_by("ts", "seq").over(wall).alias("first_seen"),
        F.col("ts").alias("last_seen"),
        F.when(F.col("kind") == "expire", F.col("ts"))
        .otherwise(F.lit(UNEXPIRED).cast("timestamp"))
        .alias("expiration"),
        (F.col("kind") == "expire").alias("expired"),
    )


def assets_as_of(history: DataFrame, t: datetime.datetime) -> DataFrame:
    """Snapshot of asset state at instant t (true time travel: a later
    resurrection does not rewrite what was visible at t)."""
    return history.where(
        (F.col("valid_from") <= F.lit(t))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(t)))
    ).select("type", "identifier", "first_seen", "last_seen", "expiration", "expired")


def snapshot_diff(
    history: DataFrame, t1: datetime.datetime, t2: datetime.datetime
) -> DataFrame:
    """What changed between two instants: each asset key tagged `added`,
    `removed`, or `changed` (state differs), comparing the t1 and t2
    snapshots. Unchanged keys are omitted.

    The audit/incremental-export primitive SCD2 history exists for:
    "what do I need to re-sync since the last export" without replaying
    events. One full-outer equi-join of two key-deduped snapshots —
    shuffles on the asset key, output bounded by churn, not history.
    """
    a = assets_as_of(history, t1).alias("a")
    b = assets_as_of(history, t2).alias("b")
    on = (F.col("a.type") == F.col("b.type")) & (
        F.col("a.identifier") == F.col("b.identifier")
    )
    joined = a.join(b, on, "full_outer")
    state_cols = ["last_seen", "expiration", "expired"]
    differs = None
    for c in state_cols:
        ne = ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        differs = ne if differs is None else (differs | ne)
    return (
        joined.select(
            F.coalesce(F.col("a.type"), F.col("b.type")).alias("type"),
            F.coalesce(F.col("a.identifier"), F.col("b.identifier")).alias("identifier"),
            F.when(F.col("a.identifier").isNull(), "added")
            .when(F.col("b.identifier").isNull(), "removed")
            .when(differs, "changed")
            .alias("change"),
        )
        .where(F.col("change").isNotNull())
    )
