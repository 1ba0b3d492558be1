"""Driver-contract simulation: the t1/t2 gates, runnable any time.

Mirrors what the round driver does — imports ``__spark_entry__.py`` BY FILE
PATH (so package-by-name imports in kernels would fail exactly as they
would under the driver), uses a VANILLA SparkSession (none of session.py's
configs), runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` in DuckDB: row count, column names, order-insensitive
multiset of normalized values. Rows-only queries are checked non-empty —
a 0-row green is a vacuous proof (round-1 lesson).

Run from ANY directory (deliberately not repo-rooted):

    python /root/repo/_scripts/driver_sim.py [sf_dir]

Exit code 0 = every oracle matches and nothing returned 0 rows.
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import math
import sys

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    # Decimals compare EXACTLY — no float round trip. Round 6 proved the
    # real driver's hasher is representation-sensitive (q_source_csv went
    # red with bit-identical digits because one side yielded Decimal);
    # normalizing Decimal -> float made this simulator structurally blind
    # to that class. Exactness here + the coltype check below make it
    # locally visible.
    if isinstance(v, decimal.Decimal):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v if isinstance(v, (int, str, bytes)) or v is None else str(v)


def coltypes(rows, cols):
    """Python type names observed per column (None excluded)."""
    seen = {c: set() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            if v is not None:
                seen[c].add(type(v).__name__)
    return seen


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    n = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(n, key=lambda row: tuple((v is None, str(v)) for v in row))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[32]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    print("entry rows:", len(mod.entry(spark).collect()))
    qs, osql = mod.queries(), mod.oracle_sql()
    print(f"{len(qs)} queries, {len(osql)} oracles")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad, empty = [], []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows, scols = sdf.collect(), sdf.columns
            if name in osql:
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
                else:
                    # representation check: the real driver's hash is type-
                    # sensitive, so the two engines must yield the SAME
                    # Python type per column even when values compare equal
                    # (Decimal(5) == 5 in Python — exactly how round 6's
                    # q_source_csv red row slipped past value comparison)
                    st = coltypes([tuple(r) for r in srows], scols)
                    dt = coltypes(drows, dcols)
                    for c in scols:
                        a, b = st[c], dt.get(c, set())
                        if a and b and a != b:
                            bad.append(name)
                            print(f"TYPE-MISMATCH {name} col={c} spark={a} duck={b}")
                            break
            if len(srows) == 0:
                empty.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            bad.append(name)
            print("ERROR", name, str(e)[:200])
    print("mismatch/error:", bad or "none")
    print("0-row results:", empty or "none")
    return 1 if (bad or empty) else 0


if __name__ == "__main__":
    raise SystemExit(main())
