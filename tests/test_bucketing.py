"""Bucketed co-located join: the plan must contain no shuffle Exchange."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.operators.bucketing import bucketed_join, write_bucketed
from graph_vulcan_assets_spark.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey")
    write_bucketed(o, "o_bucketed", "o_orderkey")

    joined = bucketed_join(spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
    # at test scale the optimizer (rightly) prefers broadcast; disable it
    # to expose the big-big case the bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it computes the right thing
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
