"""Extreme-input probe: run every oracle pair on the HOSTILE fixture with
a per-query watchdog, reporting status/wall-time per query.

The per-round hostile-probe habit (rounds 5-7: values, embeddings+ids,
timestamps, strings). The fixture is tests/test_degenerate_inputs.py's
_build_hostile_dir — poison rows live THERE so the slow parity suite
keeps every fix pinned; this script adds the watchdog (a hang is a
finding, not a timeout to wait out) and per-query timing.

    python /root/repo/_scripts/probe_extreme.py [--timeout 45] [name ...]
"""

from __future__ import annotations

import sys
import threading
import time


def main() -> int:
    args = sys.argv[1:]
    budget = 45.0
    if "--timeout" in args:
        i = args.index("--timeout")
        budget = float(args[i + 1])
        del args[i : i + 2]
    only = set(args)

    sys.path.insert(0, "/root/repo")
    import duckdb

    from pyspark.sql import SparkSession

    from graph_vulcan_assets_spark.registry import all_oracle_sql, all_queries
    from tests.test_degenerate_inputs import TABLES, _build_hostile_dir
    from tests.test_oracle_parity import rows_to_multiset

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("probe-extreme")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    deg = tempfile.mkdtemp(prefix="gvas-probe-")
    _build_hostile_dir(deg, "/root/testdata/sf0.001")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{deg}/{t}.parquet')"
        )

    queries, oracle = all_queries(), all_oracle_sql()
    names = [n for n in queries if not only or n in only]
    bad = []
    for name in names:
        t0 = time.monotonic()
        status = "OK"
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        cancel = threading.Timer(budget, lambda: sc.cancelJobGroup(name))
        duck_kill = threading.Timer(budget, con.interrupt)
        cancel.start()
        try:
            sdf = queries[name](spark, deg)
            srows, scols = sdf.collect(), sdf.columns
            if name in oracle:
                duck_kill.start()
                res = con.execute(oracle[name])
                drows, dcols = res.fetchall(), [d[0] for d in res.description]
                if not (
                    sorted(scols) == sorted(dcols)
                    and len(srows) == len(drows)
                    and rows_to_multiset([tuple(r) for r in srows], scols)
                    == rows_to_multiset(drows, dcols)
                ):
                    status = f"MISMATCH spark={len(srows)} duck={len(drows)}"
        except Exception as e:  # noqa: BLE001 — every divergence is a finding
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            status = f"ERROR {type(e).__name__}: {msg}"
        finally:
            cancel.cancel()
            duck_kill.cancel()
            sc.setJobGroup("", "")
        dt = time.monotonic() - t0
        if dt > budget:
            status = f"TIMEOUT({dt:.0f}s) " + ("" if status == "OK" else status)
        if status != "OK":
            bad.append(name)
        print(f"{status:<12} {dt:6.1f}s {name}", flush=True)

    print(f"\nnon-OK: {len(bad)}/{len(names)}", bad or "")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
