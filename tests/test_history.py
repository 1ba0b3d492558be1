"""Time-travel history tests on the golden scenario."""

from __future__ import annotations

import datetime

from graph_vulcan_assets_spark.plans import fixtures
from graph_vulcan_assets_spark.plans.history import asset_history, assets_as_of
from graph_vulcan_assets_spark.plans.temporal import RAW_SCHEMA, decode_events

UNEXPIRED = datetime.datetime(9999, 12, 12, 23, 59, 59)


def ts(minutes):
    return datetime.datetime(2024, 3, 1) + datetime.timedelta(minutes=minutes)


def build_history(spark):
    raw = spark.createDataFrame(fixtures.golden_messages(), schema=RAW_SCHEMA)
    return asset_history(decode_events(raw)).cache()


def test_version_chain_for_resurrected_asset(spark):
    hist = build_history(spark)
    h1 = sorted(
        (
            (r["valid_from"], r["valid_to"], r["expired"])
            for r in hist.where(
                (hist.type == "Hostname") & (hist.identifier == "h1.example.com")
            ).collect()
        )
    )
    # touches: create@0, refresh@5 (t2), refresh@15, expire@25, resurrect@30
    assert h1 == [
        (ts(0), ts(5), False),
        (ts(5), ts(15), False),
        (ts(15), ts(25), False),
        (ts(25), ts(30), True),
        (ts(30), None, False),
    ]


def test_as_of_sees_past_expiry_unlike_current_state(spark):
    hist = build_history(spark)
    # at t=27, h1 WAS expired — the current-state valid_at cannot see this
    # (resurrection at 30 reset the row), the history can:
    snap = {
        (r["type"], r["identifier"]): (r["expired"], r["expiration"])
        for r in assets_as_of(hist, ts(27)).collect()
    }
    assert snap[("Hostname", "h1.example.com")] == (True, ts(25))
    # and at t=31 it is alive again with first_seen preserved
    snap31 = {
        (r["type"], r["identifier"]): (r["expired"], r["first_seen"])
        for r in assets_as_of(hist, ts(31)).collect()
    }
    assert snap31[("Hostname", "h1.example.com")] == (False, ts(0))


def test_as_of_before_creation_is_empty(spark):
    hist = build_history(spark)
    assert (
        assets_as_of(hist, ts(-1))
        .where("type = 'Hostname' AND identifier = 'h1.example.com'")
        .count()
        == 0
    )


def test_history_current_versions_match_replay(spark):
    from graph_vulcan_assets_spark.plans.temporal import replay_raw

    raw = spark.createDataFrame(fixtures.golden_messages(), schema=RAW_SCHEMA)
    hist = asset_history(decode_events(raw))
    current = {
        (r["type"], r["identifier"]): (r["first_seen"], r["last_seen"], r["expiration"])
        for r in hist.where(hist.valid_to.isNull()).collect()
    }
    replayed = {
        (r["type"], r["identifier"]): (r["first_seen"], r["last_seen"], r["expiration"])
        for r in replay_raw(raw)["assets"].collect()
    }
    assert current == replayed


def test_snapshot_diff_between_instants(spark):
    """diff(t1, t2) must tag exactly the churn: the golden fixture stream
    creates, expires, and resurrects assets across its timeline, so a diff
    across the whole span reports adds; a diff across an expiry reports
    the change; identical instants report nothing."""
    import datetime

    from pyspark.sql import functions as F

    from graph_vulcan_assets_spark.plans.history import snapshot_diff

    decoded = decode_events(
        spark.createDataFrame(fixtures.golden_messages(), schema=RAW_SCHEMA)
    )
    h = asset_history(decoded).cache()
    ts = [r[0] for r in decoded.select("ts").orderBy("ts").collect()]
    t0 = ts[0] - datetime.timedelta(seconds=1)
    t_end = ts[-1] + datetime.timedelta(seconds=1)

    d_all = snapshot_diff(h, t0, t_end)
    assert d_all.where(F.col("change") == "added").count() > 0
    # self-diff is empty
    assert snapshot_diff(h, t_end, t_end).count() == 0
    # every row is one of the three tags
    tags = {r[0] for r in d_all.select("change").distinct().collect()}
    assert tags <= {"added", "removed", "changed"}
