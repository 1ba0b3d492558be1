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
import pyarrow as pa
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


def arrow_family(t: pa.DataType) -> str:
    """Coarse type family used to mirror the driver's type-tagged value hash.

    Round 1 lesson: equal values with different Arrow type tags (DuckDB
    HUGEINT → decimal128 vs Spark BIGINT → int64) hash differently on the
    driver, while a value-only comparison passes. Comparing families catches
    that class locally. Timestamps collapse to one family regardless of
    unit/tz (the testdata itself mixes ns/ms and the driver tolerates it).
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def spark_family(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "list"
    return str(dt)


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
    arrow_tbl = con.execute(ORACLE[name]).fetch_arrow_table()
    duck_cols = arrow_tbl.schema.names
    duck_rows = [
        tuple(col[i] for col in cols_py)
        for cols_py in [[c.to_pylist() for c in arrow_tbl.columns]]
        for i in range(arrow_tbl.num_rows)
    ]
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    # type-family parity (mirrors the driver's type-tagged hash)
    duck_fams = {n: arrow_family(f.type) for n, f in zip(arrow_tbl.schema.names, arrow_tbl.schema)}
    spark_fams = {f.name: spark_family(f.dataType) for f in sdf.schema.fields}
    fam_mismatch = {
        c: (spark_fams[c], duck_fams[c])
        for c in spark_fams
        if spark_fams[c] != duck_fams[c]
    }
    assert not fam_mismatch, f"{name}: type-family mismatch (spark, duck): {fam_mismatch}"
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
    # full materialization (noop write), not count(): count lets Catalyst
    # prune computed columns, so a crashing expression would never
    # evaluate and this check would pass vacuously (the same hole the
    # hostile sweep had, tests/test_degenerate_inputs.py)
    df.write.format("noop").mode("overwrite").save()
    assert len(df.columns) > 0


def test_approx_percentile_accuracy(spark, sf_dir):
    """The sketch must land within its advertised rank error of the exact
    percentile (accuracy=10000 → negligible at test scale)."""
    from pyspark.sql import functions as F

    from graph_vulcan_assets_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.9, 10000)").alias("approx"),
        F.expr("percentile(l_quantity, 0.9)").alias("exact"),
    )
    for r in both.collect():
        assert abs(r["approx"] - r["exact"]) <= max(1.0, 0.01 * r["exact"]), r
