"""SCD2 build + incremental apply (operators/scd.py).

The oracle-parity suite covers q_scd2_build's SQL equivalence; these tests
pin the semantics pytest-side (collapse, chaining, current flags) and the
incremental contract: apply(build(prefix), suffix) == build(all) on the
real event log, plus the crafted edge cases (new key, no-change batch).
"""

from __future__ import annotations

import datetime

from graph_vulcan_assets_spark.operators.scd import Scd2Store, scd2_apply, scd2_build
from graph_vulcan_assets_spark.tables import load_table


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )


def _norm(df):
    return sorted(
        (r.user_id, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    )


T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def test_collapse_and_chain(spark):
    ev = _ev(
        spark,
        [
            (1, "a", _t(0), 10),
            (1, "a", _t(5), 11),  # re-assertion: collapses
            (1, "b", _t(10), 12),
            (1, "a", _t(20), 13),  # back to a: NEW version, not merged
            (2, "x", _t(0), 20),
        ],
    )
    assert _norm(scd2_build(ev)) == [
        (1, "a", _t(0), _t(10), False),
        (1, "a", _t(20), None, True),
        (1, "b", _t(10), _t(20), False),
        (2, "x", _t(0), None, True),
    ]


def test_same_ts_ties_break_on_event_id(spark):
    """Ordering is (ts, event_id): at a shared timestamp the higher
    event_id wins the instant; the loser's version is zero-width
    ([t0, t0) — no containable time point) and is dropped (round-4 fix:
    zero-width rows duplicated the (user_id, valid_from) history key)."""
    ev = _ev(spark, [(1, "a", _t(0), 2), (1, "b", _t(0), 1)])
    rows = _norm(scd2_build(ev))
    assert rows == [
        (1, "a", _t(0), None, True),
    ]


def test_apply_equals_rebuild_on_real_log(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    cutoff = e.selectExpr(
        "timestamp_micros(CAST(percentile_approx(unix_micros(ts), 0.6) AS BIGINT)) AS c"
    ).first().c
    prefix = e.where(e.ts <= cutoff)
    suffix = e.where(e.ts > cutoff)
    assert suffix.count() > 0 and prefix.count() > 0
    incremental = scd2_apply(scd2_build(prefix), suffix)
    assert _norm(incremental) == _norm(scd2_build(e))


def test_apply_new_key_and_no_change_batch(spark):
    base = _ev(spark, [(1, "a", _t(0), 1), (2, "x", _t(0), 2)])
    dim = scd2_build(base)
    batch = _ev(
        spark,
        [
            (1, "a", _t(30), 5),  # same value: must NOT open a new version
            (3, "z", _t(40), 6),  # brand-new key
        ],
    )
    assert _norm(scd2_apply(dim, batch)) == [
        (1, "a", _t(0), None, True),
        (2, "x", _t(0), None, True),
        (3, "z", _t(40), None, True),
    ]


# ---------------------------------------------------------------------------
# Scd2Store: persisted incremental dimension
# ---------------------------------------------------------------------------


def _store_norm(store):
    return _norm(store.read())


def test_store_fold_equals_batch_rebuild(spark, sf_dir, tmp_path):
    from graph_vulcan_assets_spark.operators.scd import Scd2Store

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    # 3 chronological batches (the store's no-late-data contract)
    cuts = e.selectExpr(
        "timestamp_micros(CAST(percentile_approx(unix_micros(ts), 0.33) AS BIGINT)) AS a",
        "timestamp_micros(CAST(percentile_approx(unix_micros(ts), 0.66) AS BIGINT)) AS b",
    ).first()
    batches = [
        e.where(e.ts <= cuts.a),
        e.where((e.ts > cuts.a) & (e.ts <= cuts.b)),
        e.where(e.ts > cuts.b),
    ]
    store = Scd2Store(spark, str(tmp_path / "scd2"), n_buckets=8)
    for b in batches:
        store.apply(b)
    assert _store_norm(store) == _norm(scd2_build(e))


def test_store_duplicate_batch_redelivery_is_idempotent(spark, tmp_path):
    from graph_vulcan_assets_spark.operators.scd import Scd2Store

    b1 = _ev(spark, [(1, "a", _t(0), 1), (2, "x", _t(0), 2)])
    b2 = _ev(spark, [(1, "b", _t(10), 3), (1, "a", _t(20), 4)])
    store = Scd2Store(spark, str(tmp_path / "scd2"), n_buckets=4)
    store.apply(b1)
    store.apply(b2)
    before = _store_norm(store)
    store.apply(b2)  # at-least-once redelivery of the whole batch
    assert _store_norm(store) == before
    assert before == [
        (1, "a", _t(0), _t(10), False),
        (1, "a", _t(20), None, True),
        (1, "b", _t(10), _t(20), False),
        (2, "x", _t(0), None, True),
    ]


def test_store_crash_between_history_and_current_heals(spark, tmp_path):
    from graph_vulcan_assets_spark.operators.scd import Scd2Store, _rebuild_touched

    b1 = _ev(spark, [(1, "a", _t(0), 1)])
    b2 = _ev(spark, [(1, "b", _t(10), 2)])
    store = Scd2Store(spark, str(tmp_path / "scd2"), n_buckets=4)
    store.apply(b1)
    # simulate: history commit lands, crash before the current commit
    touched = b2.select("user_id").distinct()
    rebuilt = _rebuild_touched(store._current_of(touched), b2).localCheckpoint(eager=True)
    store.history.upsert(rebuilt.where("NOT is_current"))
    # redelivery after restart runs the full apply
    store.apply(b2)
    assert _store_norm(store) == [
        (1, "a", _t(0), _t(10), False),
        (1, "b", _t(10), None, True),
    ]


def test_scd2_stream_end_to_end(spark, sf_dir, tmp_path):
    """Structured Streaming harness: file-stream the event log in 3
    chronological chunks through foreachBatch; the maintained store must
    equal the batch rebuild."""
    from graph_vulcan_assets_spark.operators.scd import Scd2Store, run_scd2_stream

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    cuts = e.selectExpr(
        "timestamp_micros(CAST(percentile_approx(unix_micros(ts), 0.33) AS BIGINT)) AS a",
        "timestamp_micros(CAST(percentile_approx(unix_micros(ts), 0.66) AS BIGINT)) AS b",
    ).first()
    src = str(tmp_path / "src")
    # lexicographic file order must match event-time order (the stream's
    # no-late-data contract): maxFilesPerTrigger=1 consumes b0, b1, b2
    e.where(e.ts <= cuts.a).coalesce(1).write.parquet(f"{src}/b0")
    e.where((e.ts > cuts.a) & (e.ts <= cuts.b)).coalesce(1).write.parquet(f"{src}/b1")
    e.where(e.ts > cuts.b).coalesce(1).write.parquet(f"{src}/b2")

    store = Scd2Store(spark, str(tmp_path / "scd2"), n_buckets=8)
    q = run_scd2_stream(store, src + "/b*", e.schema, str(tmp_path / "ckpt"))
    assert q.awaitTermination(300), "scd2 stream did not finish"
    assert _store_norm(store) == _norm(scd2_build(e))


def test_same_timestamp_changes_keep_history_keys_unique(spark, tmp_path):
    """Round-4 fix: two attribute changes sharing one timestamp used to
    emit a zero-width closed row PLUS the survivor, both keyed
    (user_id, ts) — violating BucketTable.upsert's key-unique
    precondition and making history content replay-order-dependent.
    Zero-width versions (no containable time point) are now dropped."""
    import datetime

    t = lambda m: datetime.datetime(2024, 5, 1) + datetime.timedelta(minutes=m)  # noqa: E731
    events = spark.createDataFrame(
        [
            (7, "A", t(5), 1),
            (7, "B", t(5), 2),   # same ts, later event_id: B wins the instant
            (7, "C", t(9), 3),
        ],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    dim = scd2_build(events).collect()
    rows = sorted((r.attr, r.valid_from, r.valid_to) for r in dim)
    # A's zero-width [5,5) is gone; B holds [5,9); C is current
    assert rows == [("B", t(5), t(9)), ("C", t(9), None)]
    keys = [(r.user_id, r.valid_from) for r in dim]
    assert len(keys) == len(set(keys))

    # and the persisted store accepts the same batch without key collisions
    store = Scd2Store(spark, str(tmp_path / "scd"), n_buckets=4)
    store.apply(events)
    got = sorted((r.attr, r.valid_from, r.valid_to) for r in store.read().collect())
    assert got == rows
