"""SQL API surface: registered views + spark.sql produce the same plans
as the DataFrame API (Catalyst normalizes both)."""

from __future__ import annotations

from graph_vulcan_assets_spark.tables import TABLES, register_views


def test_register_views_and_query(spark, sf_dir):
    register_views(spark, sf_dir)
    names = {r["viewName"] for r in spark.sql("SHOW VIEWS").collect()}
    assert set(TABLES) <= names
    df = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O' GROUP BY l_returnflag
        """
    )
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"l_returnflag", "n"}


def test_events_view_has_timestamp_type(spark, sf_dir):
    register_views(spark, sf_dir)
    dtype = dict(spark.table("events").dtypes)["ts"]
    assert dtype == "timestamp"  # ns parquet handled by the loader
