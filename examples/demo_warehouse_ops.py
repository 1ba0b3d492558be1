"""End-to-end demo: the day-2 operations loop of a 100 TB events table —
validate → monitor → regularize → roll up → replicate → forget.

Every stage is a registered operator or a BucketTable primitive:

  1. data-quality contract (q_dq_checks): does the partition ship?
  2. volume anomaly scan (q_anomaly_zscore): which hours look wrong?
  3. gap fill (q_timeseries_gapfill): regularize the series for
     downstream consumers;
  4. distinct-user rollup from persisted HLL sketches (q_hll_rollup):
     the incremental-cube path;
  5. CDC replication (BucketTable.changes → apply_changes): a replica
     follows the hot store at O(touched buckets);
  6. right-to-be-forgotten (BucketTable.purge): a user's rows leave the
     bytes on disk, history included.

Run: python examples/demo_warehouse_ops.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_vulcan_assets_spark.registry import all_queries  # noqa: E402
from graph_vulcan_assets_spark.session import get_spark  # noqa: E402
from graph_vulcan_assets_spark.sources.bucketstore import BucketTable  # noqa: E402
from graph_vulcan_assets_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="gvas-warehouse-demo", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # 1. the DQ contract decides whether the partition ships
    report = qs["q_dq_checks"](spark, sf_dir).collect()
    for r in report:
        print(
            f"  [{'PASS' if r['passed'] else 'FAIL'}] {r['check']}: "
            f"observed={r['observed']} bound={r['bound']}"
        )
    failing = [r["check"] for r in report if not r["passed"]]
    print(f"dq: {len(report) - len(failing)}/{len(report)} checks pass; "
          f"quarantine candidates: {failing}")

    # 2. volume anomalies
    anomalies = qs["q_anomaly_zscore"](spark, sf_dir).where("is_anomaly")
    worst = anomalies.orderBy(F.abs(F.col("z_micros")).desc()).limit(3).collect()
    print(f"anomaly scan: {anomalies.count()} anomalous hours; worst: "
          + ", ".join(f"{r['event_type']}@{r['hour']} z={r['z_micros'] / 1e6:.2f}"
                      for r in worst))

    # 3. regularized series for downstream consumers
    filled = qs["q_timeseries_gapfill"](spark, sf_dir)
    print(f"gap fill: {filled.count()} spine hours, "
          f"{filled.where('gap').count()} filled")

    # 4. incremental distinct-user rollup from persisted sketches
    for r in qs["q_hll_rollup"](spark, sf_dir).collect():
        print(f"  hll rollup: {r['event_type']}: ~{r['approx_distinct']} users "
              f"({r['n_rows']} events)")

    # 5+6. hot store → CDC replica → erasure
    events = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as tmp:
        hot = BucketTable(spark, f"{tmp}/hot", key_cols=["event_id"], n_buckets=16)
        replica = BucketTable(
            spark, f"{tmp}/replica", key_cols=["event_id"], n_buckets=16
        )
        v0 = hot.upsert(events.limit(5000))
        replica.upsert(hot.read(version=v0))

        late = events.limit(5200).join(
            events.limit(5000).select("event_id"), "event_id", "left_anti"
        )
        v1 = hot.upsert(late)
        feed = hot.changes(v0, v1)
        replica.apply_changes(feed)
        print(f"cdc: applied {feed.count()} changes; replica in sync: "
              f"{replica.read().count() == hot.read().count()}")

        victim = hot.read().select("user_id").first()["user_id"]
        keys = hot.read().where(F.col("user_id") == victim).select("event_id")
        n_keys = keys.count()
        hot.purge(keys)
        left = hot.read().where(F.col("user_id") == victim).count()
        print(f"erasure: purged user {victim} ({n_keys} events); remaining "
              f"rows for user: {left}")


if __name__ == "__main__":
    main()
