"""Skew stress on the temporal replay (round-2 verdict item #4).

A hot key — one asset receiving 50% of all events, realistic for a
popular host being re-scanned constantly — must not serialize the replay:
per-key ordered semantics make the hot entity's own event chain
inherently sequential, but everything else proceeds in parallel, so
wall-time stays within ~2x of a uniform stream at equal event count.
"""

from __future__ import annotations

import time

import pytest

from graph_vulcan_assets_spark.plans import fixtures
from graph_vulcan_assets_spark.plans.temporal import (
    RAW_SCHEMA,
    replay_raw,
    tag_union_state,
    tuned_for_batch,
)

N = 6000


def _replay_seconds(spark, msgs, runs: int = 3) -> float:
    raw = spark.createDataFrame(msgs, schema=RAW_SCHEMA)
    n = raw.count()
    best = float("inf")
    with tuned_for_batch(spark, n):
        for _ in range(runs):
            start = time.perf_counter()
            tag_union_state(replay_raw(raw)).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - start)
    return best


@pytest.mark.slow
def test_hot_key_replay_within_2x_of_uniform(spark):
    skewed = fixtures.skewed_messages(7, n=N, n_assets=200, hot_frac=0.5)
    uniform = fixtures.uniform_messages(7, n=N, n_assets=200)
    # warm both plans once (codegen compile outside the timing)
    _replay_seconds(spark, uniform[:200], runs=1)
    # one full re-measure before failing (round-9 load-aware protocol):
    # the control is co-measured, but a co-tenant spike that hits only
    # the skewed window would otherwise red the bound spuriously
    for _attempt in range(2):
        t_uniform = _replay_seconds(spark, uniform)
        t_skewed = _replay_seconds(spark, skewed)
        if t_skewed <= 2.0 * max(t_uniform, 0.5):
            return
    pytest.fail(
        f"hot-key replay {t_skewed:.2f}s vs uniform {t_uniform:.2f}s on both "
        "attempts — skew is serializing the replay"
    )


@pytest.mark.slow
def test_hot_key_replay_is_exact(spark):
    """Skew must not change answers: the hot-key stream replays to exactly
    the sequential interpreter's state."""
    from tests.test_temporal import state_from_interpreter, state_from_replay

    msgs = fixtures.skewed_messages(11, n=400, n_assets=30, hot_frac=0.5)
    assert state_from_replay(spark, msgs) == state_from_interpreter(msgs)
