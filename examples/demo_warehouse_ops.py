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


def probe_event_id(table):
    return table.read().select("event_id").first()["event_id"]


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

        # 7. secondary index on user_id: point lookups stop scanning
        from graph_vulcan_assets_spark.sources.secondary_index import SecondaryIndex

        idx = SecondaryIndex(spark, f"{tmp}/idx", hot, "user_id", n_buckets=16)
        idx.refresh()
        probe_user = hot.read().select("user_id").first()["user_id"]
        n_hits = idx.lookup(probe_user).count()
        print(f"index: user {probe_user} -> {n_hits} events from one "
              f"index bucket (base untouched)")

        # 8. native reads through the custom data source + change stream
        from graph_vulcan_assets_spark.sources.pyds import (
            BucketTableDataSource,
            diff_commits,
        )

        spark.dataSource.register(BucketTableDataSource)
        native = spark.read.format("buckettable").option("path", hot.path).load()
        one = (
            spark.read.format("buckettable")
            .option("path", hot.path)
            .option("key", str(probe_event_id(hot)))
            .load()
            .count()
        )
        print(f"datasource: format('buckettable') sees {native.count()} rows; "
              f"option('key') point read pruned to one bucket ({one} row)")
        tail = diff_commits(hot.path, ["event_id"], v0, v1)
        print(f"datasource: cdf tail of v{v0}->v{v1}: {len(tail)} change rows")

        # 9. result cache: the dashboard rollup pays its scan once
        from graph_vulcan_assets_spark.plans.cache import ResultCache

        cache = ResultCache(spark, f"{tmp}/cache")
        rollup = native.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        cache.get_or_compute(rollup)
        hit = cache.lookup(rollup) is not None
        print(f"result cache: second issue of the rollup is a hit: {hit}")

        victim = hot.read().select("user_id").first()["user_id"]
        keys = hot.read().where(F.col("user_id") == victim).select("event_id")
        n_keys = keys.count()
        hot.purge(keys)
        left = hot.read().where(F.col("user_id") == victim).count()
        print(f"erasure: purged user {victim} ({n_keys} events); remaining "
              f"rows for user: {left}")


if __name__ == "__main__":
    main()
