"""Run the driver_sim comparison for a SUBSET of queries.

    python /root/repo/_scripts/check_subset.py q_source_csv q_source_jsonl [--sf DIR]

Same gates as driver_sim (exact Decimal compare + per-column Python-type
parity), but only for the named keys — the fast loop while iterating.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb

sys.path.insert(0, "/root/repo/_scripts")
from driver_sim import TABLES, coltypes, multiset  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("check-subset")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    for name in names:
        if name not in qs:
            print("UNKNOWN", name)
            bad.append(name)
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            srows, scols = sdf.collect(), sdf.columns
            if name not in osql:
                print(f"rows-only {name}: {len(srows)} rows")
                if not srows:
                    bad.append(name)
                continue
            res = con.execute(osql[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and multiset([tuple(r) for r in srows], scols) == multiset(drows, dcols)
            )
            if not ok:
                bad.append(name)
                print("MISMATCH", name, len(srows), len(drows))
                continue
            st = coltypes([tuple(r) for r in srows], scols)
            dt = coltypes(drows, dcols)
            tmm = [
                (c, st[c], dt.get(c, set()))
                for c in scols
                if st[c] and dt.get(c) and st[c] != dt[c]
            ]
            if tmm:
                bad.append(name)
                print("TYPE-MISMATCH", name, tmm)
            else:
                print("OK", name, len(srows), "rows")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print("ERROR", name, str(e)[:300])
    print("bad:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
