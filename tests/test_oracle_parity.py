"""Local mirror of the driver's t2 correctness gate.

For every registered query with an oracle, run the Spark DataFrame and the
DuckDB SQL on the same parquet tables and compare: row count, column names,
and the order-insensitive multiset of normalized row values.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from graph_vulcan_assets_spark.registry import all_oracle_sql, all_queries
from graph_vulcan_assets_spark.tables import TABLES

QUERIES = all_queries()
ORACLE = all_oracle_sql()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # final guard: values are already rounded inside the queries; this
        # only absorbs sub-ulp representation noise
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int, str, bytes)) or v is None:
        return v
    return str(v)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normalized = [tuple(normalize(r[i]) for i in order) for r in rows]
    # None-safe deterministic ordering; equality still compares raw tuples
    return sorted(normalized, key=lambda row: tuple((v is None, str(v)) for v in row))


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = duck_connection(sf_dir)
    res = con.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_to_multiset([tuple(r) for r in spark_rows], spark_cols)
    d = rows_to_multiset(duck_rows, duck_cols)
    if s != d:
        diff_s = [r for r in s if r not in d][:5]
        diff_d = [r for r in d if r not in s][:5]
        pytest.fail(
            f"{name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
