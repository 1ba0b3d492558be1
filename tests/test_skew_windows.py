"""Hot-key skew probe for the operators that legitimately remain true
windows (VERDICT r7 #2 — the half of the skew plan the round-7
argmax-as-aggregate conversion did NOT cover).

A window function cannot split a key: rank/ntile need the whole
partition ordered, lag/lead/running-sum are sequential per key by
definition, and sessionization is a running sum of gap markers. So when
one user owns 90% of all events (one viral account, one scraper — the
realistic hot key at 100 TB), that user's chain serializes onto one
core while every other key proceeds in parallel. The ACCEPTED bound,
documented here: wall-time on the 90%-hot stream stays within a small
constant of the uniform stream at equal row count — the hot partition
costs one core's linear pass, never a quadratic blow-up, a spill storm,
or a plan change that drags every OTHER key into the hot task.

The probe times the REGISTERED queries (the real driver surface, via a
synthetic events.parquet), not reimplementations, so a future plan
regression in the query itself fails here:

  * q_win_rank          — rank/dense_rank/ntile, hot event_type
  * q_win_lag_lead      — lag/lead, hot user_id
  * q_win_running_sum   — cumulative ROWS frame, hot user_id
  * q_sessionize        — lag + cum-sum gap markers, hot user_id
  * q_win_topk_group    — WindowGroupLimit: the one family that IS
                          skew-resistant (map-side partial top-k before
                          the shuffle), so it gets a tighter bound
  * replay_sessionize   — the streaming twin (applyInPandasWithState):
                          one pandas group holds 90% of rows

Measured ratios at N=600k on local[8] are recorded in NOTES_r8 §skew.
Bounds are deliberately generous (timing test on a shared host); the
failure mode they catch is superlinear, not a noisy +20%.
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import all_queries

N = 600_000
HOT_FRAC = 0.9
N_KEYS = 211  # prime, so modular assignment spreads evenly


def _write_events(spark, out: str, skew: bool) -> None:
    """Synthetic events table: 90% of rows on one hot user (and one hot
    event_type) when skew=True, uniform modular spread otherwise.
    Timestamps are in-domain, values finite/quantizable — the real
    queries' gates must not drop anything, or the comparison would time
    different row counts."""
    base = spark.range(N)
    rid = F.col("id")
    if skew:
        user = F.when(rid % 10 < 9, F.lit(7)).otherwise(rid % N_KEYS)
        etype = F.when(rid % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("t"), (rid % 13).cast("string"))
        )
    else:
        user = rid % N_KEYS
        etype = F.concat(F.lit("t"), (rid % 13).cast("string"))
    df = base.select(
        rid.alias("event_id"),
        # scrambled but collision-light ordering axis inside each key
        F.timestamp_seconds(F.lit(1700000000) + (rid * 37) % 8640000).alias("ts"),
        user.cast("long").alias("user_id"),
        etype.alias("event_type"),
        ((rid % 1000).cast("double") / 10.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")


def _best_seconds(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.slow
def test_hot_key_window_walltime_bounded(spark, tmp_path):
    uni_dir, skew_dir = str(tmp_path / "uni"), str(tmp_path / "skew")
    _write_events(spark, uni_dir, skew=False)
    _write_events(spark, skew_dir, skew=True)

    queries = all_queries()
    # (query, accepted wall-time ratio): 4.0 for true windows (the hot
    # chain is one core's linear pass — see module docstring), 2.5 for
    # the WindowGroupLimit family (partial top-k pruning makes the hot
    # key's shuffle volume k-per-map-partition, nearly skew-immune)
    cases = [
        ("q_win_rank", 4.0),
        ("q_win_lag_lead", 4.0),
        ("q_win_running_sum", 4.0),
        ("q_sessionize", 4.0),
        ("q_win_topk_group", 2.5),
    ]

    def run(name: str, sf_dir: str) -> None:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # warm codegen/readers once, outside the timings
    run("q_win_topk_group", uni_dir)

    report, failures = {}, []
    for name, bound in cases:
        # one full re-measure before recording a failure (round-9
        # load-aware protocol): the control is co-measured, but a
        # co-tenant spike hitting only the skewed window would
        # otherwise red the bound spuriously
        for _attempt in range(2):
            t_uni = _best_seconds(lambda: run(name, uni_dir))
            t_skew = _best_seconds(lambda: run(name, skew_dir))
            if t_skew <= bound * max(t_uni, 0.75):
                break
        ratio = t_skew / max(t_uni, 1e-9)
        report[name] = (round(t_uni, 2), round(t_skew, 2), round(ratio, 2))
        # 0.75 s floor: below it the runtime is scheduling noise, and a
        # "3x" of nothing is not a skew signal
        if t_skew > bound * max(t_uni, 0.75):
            failures.append(f"{name}: uniform={t_uni:.2f}s skew={t_skew:.2f}s "
                            f"ratio={ratio:.1f} bound={bound}")
    print(f"skew-window report (uniform_s, skew_s, ratio): {report}")
    assert not failures, "hot-key wall-time blew its documented bound:\n" + "\n".join(failures)


@pytest.mark.slow
def test_hot_key_streaming_sessionize_bounded(spark, tmp_path):
    """The streaming sessionizer's hot-group bound: one user owning 90%
    of a 60k-event replay funnels 54k rows through a single pandas group
    in applyInPandasWithState — that group is inherently sequential, but
    the run must stay within a small constant of the uniform replay (no
    per-row Python looping blow-up, no state-store thrash)."""
    from graph_vulcan_assets_spark.streaming.stateful import replay_sessionize

    n = 60_000
    uni_dir, skew_dir = str(tmp_path / "suni"), str(tmp_path / "sskew")
    for out, skew in ((uni_dir, False), (skew_dir, True)):
        base = spark.range(n)
        rid = F.col("id")
        user = (
            F.when(rid % 10 < 9, F.lit(7)).otherwise(rid % N_KEYS)
            if skew
            else rid % N_KEYS
        )
        base.select(
            rid.alias("event_id"),
            F.timestamp_seconds(F.lit(1700000000) + (rid * 37) % 864000).alias("ts"),
            user.cast("long").alias("user_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    def run(sf_dir: str, tag: str) -> None:
        base = str(tmp_path / f"stream-{tag}")
        replay_sessionize(spark, sf_dir, base + "/ckpt", base + "/src").write.format(
            "noop"
        ).mode("overwrite").save()

    for _attempt in range(2):  # one retry — round-9 load-aware protocol
        # fresh checkpoint/source dirs per attempt: resuming a used
        # checkpoint would replay nothing and time an empty batch
        t_uni = _best_seconds(lambda: run(uni_dir, f"u{_attempt}"), runs=1)
        t_skew = _best_seconds(lambda: run(skew_dir, f"s{_attempt}"), runs=1)
        ratio = t_skew / max(t_uni, 1e-9)
        print(
            f"streaming sessionize: uniform={t_uni:.2f}s skew={t_skew:.2f}s "
            f"ratio={ratio:.2f}"
        )
        if t_skew <= 4.0 * max(t_uni, 2.0):
            return
    pytest.fail(
        f"hot-user streaming sessionize serialized on both attempts: "
        f"uniform={t_uni:.2f}s skew={t_skew:.2f}s"
    )
