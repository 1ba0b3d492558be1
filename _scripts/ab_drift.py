"""Isolated-entry runner for the two drifting bench entries (VERDICT r7 #3).

`temporal_replay_20k_events` drifted 2.59 s (r5) -> ~3.2 s (r7) and
`store_upsert_small_touch` 0.45 -> 0.56-0.78 across three independent
quiet-host runs, yet `plans/temporal.py`, `plans/fixtures.py`,
`sources/bucketstore.py` and `sources/secondary_index.py` are
byte-identical since round 5 (verified: `git diff 94ada10..HEAD` on all
four is empty).  That leaves exactly two candidate causes, and this
harness separates them:

1. **Sweep residue** — in bench.py both entries run AFTER the 33-query
   headline sweep inside the same JVM; the sweep's queries changed in
   r6/r7 (ts gates, argmax conversion), so the session the entries
   inherit (heap shape, code cache, cleaner backlog) changed even though
   the entries did not.  Diagnosis: run the entries ISOLATED in a fresh
   session — if isolated time is back at the r5 level while the in-bench
   number is not, residue is the cause.
2. **Host epoch** — the box itself got slower between the r5 and r7
   measurement epochs (the round-6 adjudication found exactly this).
   Diagnosis: interleave full `python bench.py` runs of HEAD vs the r5
   checkout (worktree at 94ada10) on the same quiet host — identical
   entry code, only the surrounding sweep differs; if BOTH show ~3.2 s
   today, the r5-vs-r7 gap is epoch, not code.

Usage:
    python /path/to/checkout/_scripts/ab_drift.py --entry both --reps 5
The measured checkout is the one CONTAINING this script (derived from
the script path, not the cwd — ADVICE r8: a cwd-relative import could
silently measure whichever bench.py shadows the path, in an A/B that
exists precisely to compare checkouts). The JSON line records the
checkout's git SHA next to the label so runs are self-identifying.
Prints one JSON line: per-rep seconds for each entry.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import subprocess
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entry", choices=["replay", "store", "both"], default="both")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--label", default="HEAD")
    args = ap.parse_args()

    # measure the checkout this script lives in, wherever it is launched from
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(root, "bench.py")):
        sys.exit(f"ab_drift: no bench.py next to {root!r} — not a checkout root")
    sys.path.insert(0, root)
    try:
        sha = subprocess.run(
            ["git", "-C", root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, check=True,
        ).stdout.strip()
    except Exception:  # detached tarball, git missing — still measurable
        sha = "unknown"

    import bench  # the checkout's bench.py: reuse its fixtures verbatim
    from graph_vulcan_assets_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    out: dict = {"label": args.label, "git_sha": sha, "root": root,
                 "sf_dir": sf_dir, "pid": os.getpid(),
                 "loadavg_start": round(os.getloadavg()[0], 2)}

    if args.entry in ("replay", "both"):
        from graph_vulcan_assets_spark.plans.fixtures import random_messages
        from graph_vulcan_assets_spark.plans.temporal import (
            RAW_SCHEMA,
            replay_raw,
            tag_union_state,
            tuned_for_batch,
        )

        msgs = random_messages(99, n=20000)
        raw = spark.createDataFrame(msgs, schema=RAW_SCHEMA)
        n_rows = raw.count()
        # one untimed warmup (bench.py's sweep serves this role in-bench)
        with tuned_for_batch(spark, n_rows):
            bench.run_to_completion(tag_union_state(replay_raw(raw)))
        gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(5)
        secs = []
        with tuned_for_batch(spark, n_rows):
            for _ in range(args.reps):
                t0 = time.perf_counter()
                bench.run_to_completion(tag_union_state(replay_raw(raw)))
                secs.append(round(time.perf_counter() - t0, 3))
        out["temporal_replay_20k_events"] = secs

    if args.entry in ("store", "both"):
        timings = bench.Timings()
        bench.bench_storage(spark, sf_dir, timings)
        out["store_reps"] = {
            name: [round(s, 3) for s in reps]
            for name, reps in timings.reps.items()
        }

    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
