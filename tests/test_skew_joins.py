"""Hot-key skew probe for the SHUFFLE-JOIN family (the round-9 candidate
from NOTES_r8, pulled forward): windows got wall-time bounds in
`test_skew_windows.py`; joins have a different pair of mechanisms and
deserve their own pins.

At 100 TB a fact-side hot key (one mega-customer owning 90% of orders)
hits a shuffle join in one of two ways:

1. **AQE-splittable** — inner/semi SMJ: `OptimizeSkewedJoin` may split
   the oversized partition into advisory-sized slices, each joined
   against a duplicated copy of the other side's partition, so the hot
   key parallelizes back across cores. The probe pins BOTH the wall-time
   bound AND the mechanism (`skew=true` in the final adaptive plan) so a
   conf regression that silently disables the splitter fails loudly.
   (The test lowers the skew thresholds to MB scale — the default 256 MB
   trigger is cluster-sized, and the probe's point is the mechanism, not
   the threshold.)
2. **NOT splittable** — the hot key on the preserved-opposite side of an
   outer join: `q_join_asof` left-joins events to orders on
   user_id = o_custkey, and AQE cannot split the RIGHT side of a LEFT
   OUTER join (splitting the stream side of the outer form would
   duplicate unmatched rows). The hot customer's order partition
   serializes onto one core — a linear sort + merge, same acceptance
   class as the true windows (one core's linear pass, documented bound),
   never quadratic. The per-event max_by partial aggregation after the
   join still reduces map-side, so the explosion of matched pairs never
   crosses a shuffle.

Both probes time the REGISTERED queries on synthetic fixtures with
broadcast disabled (the 100 TB shape: neither side broadcastable);
measured ratios at N=600k orders on local[8] are recorded in NOTES_r8.
Bounds are generous — the failure mode caught is superlinear blow-up or
a lost mechanism, not a noisy +20%.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import pytest

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import all_queries

N_ORDERS = 600_000
N_EVENTS = 150_000
N_CUST = 40_000
HOT_CUST = 7


def _write_fixture(spark, out: str, skew: bool) -> None:
    """orders + customer + events with TPC-H-ish schemas: 90% of orders
    on one hot custkey when skew=True, uniform modular spread otherwise.
    Timestamps stay in-domain so the queries' gates drop nothing."""
    rid = F.col("id")
    cust = (
        F.when(rid % 10 < 9, F.lit(HOT_CUST)).otherwise(rid % N_CUST)
        if skew
        else rid % N_CUST
    )
    spark.range(N_ORDERS).select(
        rid.alias("o_orderkey"),
        cust.cast("long").alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        ((rid % 9973).cast("double") / 7.0).alias("o_totalprice"),
        F.timestamp_seconds(F.lit(1690000000) + (rid * 53) % 8640000).alias(
            "o_orderdate"
        ),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    spark.range(N_CUST).select(
        rid.alias("c_custkey"),
        F.concat(F.lit("Customer#"), rid.cast("string")).alias("c_name"),
        (rid % 25).cast("int").alias("c_nationkey"),
        ((rid % 997).cast("double") / 3.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    ).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    spark.range(N_EVENTS).select(
        rid.alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + (rid * 37) % 864000).alias("ts"),
        (rid % N_CUST).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        ((rid % 1000).cast("double") / 10.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")


@contextmanager
def _shuffle_join_conf(spark):
    """The 100 TB join shape at probe scale: broadcast off (both sides
    'too big'), AQE skew thresholds lowered from the cluster-sized
    256 MB default so OptimizeSkewedJoin can act on MB partitions."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _best_seconds(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _assert_ratio_bounded(run, uni_dir: str, skew_dir: str, bound: float, label: str):
    """Wall-time effect pin with one full re-measure (ADVICE r8): the
    deterministic plan pins carry the skew signal; this ratio bound only
    catches superlinear blow-ups, so a co-tenant load spike that hits a
    single measurement window gets one retry instead of redding CI. The
    0.75 s floor keeps sub-scheduling-noise runtimes from faking a ratio."""
    last = ""
    for _ in range(2):
        t_uni = _best_seconds(lambda: run(uni_dir))
        t_skew = _best_seconds(lambda: run(skew_dir))
        ratio = t_skew / max(t_uni, 1e-9)
        print(f"{label}: uniform={t_uni:.2f}s skew={t_skew:.2f}s ratio={ratio:.2f}")
        if t_skew <= bound * max(t_uni, 0.75):
            return
        last = f"uniform={t_uni:.2f}s skew={t_skew:.2f}s ratio={ratio:.1f}"
    pytest.fail(f"{label} blew its {bound}x bound on both attempts: {last}")


@pytest.mark.slow
def test_hot_key_shuffle_join_aqe_splits(spark, tmp_path):
    """Inner SMJ with a 90%-hot fact key: AQE must split the hot
    partition (mechanism pin) and wall-time must stay within a small
    constant of the uniform twin (effect pin)."""
    uni_dir, skew_dir = str(tmp_path / "uni"), str(tmp_path / "skew")
    _write_fixture(spark, uni_dir, skew=False)
    _write_fixture(spark, skew_dir, skew=True)
    q = all_queries()["q_join_inner"]

    with _shuffle_join_conf(spark):
        # mechanism: run to completion via the SAME DataFrame's plan, then
        # read the finalized adaptive plan — the hot run must show skew=true.
        # (String pin tied to pyspark 4.1.2's SortMergeJoin rendering; if a
        # version bump reds this, check the plan format before suspecting a
        # lost OptimizeSkewedJoin — ADVICE r8.)
        df = q(spark, skew_dir).select("o_orderkey")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "OptimizeSkewedJoin did not split the 90%-hot partition; "
            "final plan:\n" + plan[:2000]
        )
        # deterministic EFFECT pin (ADVICE r8): the splitter must have
        # rewritten the skewed fixture's shuffle read ("AQEShuffleRead ...
        # skewed" = the hot partition was actually sliced), and the uniform
        # twin — same code, same confs, same volume — must NOT trip it.
        # A load spike can't forge or hide this differential, so wall-time
        # below is only a backstop for superlinear regressions.
        assert any(
            "AQEShuffleRead" in ln and "skewed" in ln for ln in plan.splitlines()
        ), "no skew-sliced shuffle read in the finalized plan:\n" + plan[:2000]
        uni_df = q(spark, uni_dir).select("o_orderkey")
        uni_df.collect()
        uni_plan = uni_df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in uni_plan, (
            "uniform twin reported skew splits — fixture or threshold "
            "no longer isolates the hot key:\n" + uni_plan[:2000]
        )

        def run(sf_dir: str) -> None:
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run(uni_dir)  # warm
        # split slices re-parallelize the hot key; 3x absorbs slice
        # scheduling overhead on a shared host, and a serialized partition
        # (the mechanism failing) would show up well above it at this N
        _assert_ratio_bounded(run, uni_dir, skew_dir, 3.0, "skew-join inner")


@pytest.mark.slow
def test_hot_key_asof_right_side_bounded(spark, tmp_path):
    """As-of join with the hot key on the RIGHT of the left-outer form —
    the partition AQE cannot split. Accepted bound: one core's linear
    sort+merge pass over the hot orders, with the post-join max_by
    reducing matched pairs map-side before the event_id shuffle."""
    uni_dir, skew_dir = str(tmp_path / "uni"), str(tmp_path / "skew")
    _write_fixture(spark, uni_dir, skew=False)
    _write_fixture(spark, skew_dir, skew=True)
    q = all_queries()["q_join_asof"]

    def run(sf_dir: str) -> None:
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()

    with _shuffle_join_conf(spark):
        run(uni_dir)  # warm
        # no mechanism exists here (AQE can't split the preserved-opposite
        # side of the outer form), so the wall bound IS the pin — the retry
        # keeps a one-window load spike from redding it
        _assert_ratio_bounded(run, uni_dir, skew_dir, 5.0, "skew-join asof")
