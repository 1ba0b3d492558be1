"""Isolated per-query timing: N reps of the noop sink per named query.

    python _scripts/time_queries.py q_kmeans_assign q_pq_codes [--reps 3]

Same methodology as bench.py (warm at sf0.001 first, then reps at
$SPARK_GRAFT_SF_DIR), for the fast loop while iterating on one operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_vulcan_assets_spark.registry import all_queries  # noqa: E402
from graph_vulcan_assets_spark.session import get_spark  # noqa: E402


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gvas-time-queries")
    qs = all_queries()
    warm = "/root/testdata/sf0.001"
    for name in args:
        spark.sparkContext.setJobDescription(f"warm {name}")
        run(qs[name](spark, warm if os.path.isdir(warm) else sf_dir))
        secs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time {name}")
            t0 = time.perf_counter()
            run(qs[name](spark, sf_dir))
            secs.append(time.perf_counter() - t0)
        import gc

        gc.collect()
        print(f"TIMING {name}: min={min(secs):.3f} all={[round(s,3) for s in secs]}")


if __name__ == "__main__":
    main()
