"""F7 map-edge divergence catalog (round 9, VERDICT r8 #4).

The package's only map-construction site is q_map_funcs' ``create_map``
with LITERAL keys ("type"/"uid"), so no registered query can reach a
missing-key, null-key, or duplicate-key map edge from data — and
``map_from_entries`` is deliberately avoided for Kafka-style headers
because duplicate keys raise (documented at plans/temporal.py:135).
These pins make that audit executable: they record what EACH engine
does at every map edge on this pinned pair (pyspark 4.1.2 ANSI-on,
bundled duckdb), so a future edit that introduces data-derived map
keys has a divergence catalog in CI instead of a docstring claim.

Measured round 9 (and pinned below):

* **Lookups are benign on both engines** — Spark's ``element_at`` /
  ``try_element_at`` / ``getItem`` on a missing or NULL map key all
  return NULL even with ANSI enabled (unlike ARRAY element_at, which
  kills the query on an out-of-range index — the round-8 find); DuckDB's
  subscript yields an empty list. So a q_map_funcs-style lookup is not
  a query-killer surface.
* **Construction is a query-killer CLASS on both engines** — a single
  row with a NULL key (NULL_MAP_KEY) or a duplicate key
  (DUPLICATED_MAP_KEY, default mapKeyDedupPolicy=EXCEPTION) aborts the
  whole Spark job, across create_map / map_from_entries /
  map_from_arrays / str_to_map / map_concat; DuckDB's map() raises the
  twin errors. Any future data-derived map construction must sanitize
  keys first (filter nulls, dedup e.g. via max_by over the key) or flip
  mapKeyDedupPolicy deliberately — one dirty row must cost one row, not
  the job (the round-7/8 discipline).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.errors import SparkRuntimeException
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mapdf(spark):
    return spark.range(1).select(
        F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)).alias("m")
    )


def test_session_is_the_pinned_shape(spark):
    """The catalog below is measured under ANSI + EXCEPTION dedup — the
    driver's vanilla-session defaults on this Spark. If either default
    moves, re-measure the catalog before trusting it."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    assert spark.conf.get("spark.sql.mapKeyDedupPolicy") == "EXCEPTION"


def test_map_lookups_are_null_safe_even_under_ansi(mapdf):
    """Missing-key and NULL-key MAP lookups return NULL on Spark 4.1.2
    with ANSI on — maps differ from arrays here (array element_at on a
    bad index raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT, round-8 find)."""
    row = mapdf.select(
        F.element_at("m", "zzz").alias("missing"),
        F.try_element_at("m", F.lit("zzz")).alias("try_missing"),
        F.col("m")["zzz"].alias("subscript_missing"),
        F.element_at("m", F.lit(None).cast("string")).alias("null_key"),
        F.element_at("m", "a").alias("present"),
    ).collect()[0]
    assert row.missing is None
    assert row.try_missing is None
    assert row.subscript_missing is None
    assert row.null_key is None
    assert row.present == 1


@pytest.mark.parametrize(
    "label, build",
    [
        (
            "create_map_null_key",
            lambda: F.create_map(F.lit(None).cast("string"), F.lit(1)),
        ),
        (
            "map_from_entries_null_key",
            lambda: F.map_from_entries(
                F.array(F.struct(F.lit(None).cast("string").alias("k"), F.lit(1).alias("v")))
            ),
        ),
        (
            "map_from_entries_dup_keys",
            lambda: F.map_from_entries(
                F.array(
                    F.struct(F.lit("k").alias("k"), F.lit(1).alias("v")),
                    F.struct(F.lit("k").alias("k"), F.lit(2).alias("v")),
                )
            ),
        ),
        (
            "map_from_arrays_dup_keys",
            lambda: F.map_from_arrays(F.array(F.lit("k"), F.lit("k")), F.array(F.lit(1), F.lit(2))),
        ),
        (
            "str_to_map_dup_keys",
            lambda: F.expr("str_to_map('k:1,k:2', ',', ':')"),
        ),
        (
            "map_concat_dup_keys",
            lambda: F.map_concat(
                F.create_map(F.lit("k"), F.lit(1)), F.create_map(F.lit("k"), F.lit(2))
            ),
        ),
    ],
)
def test_map_construction_edges_kill_the_query(spark, label, build):
    """One null-key or duplicate-key row aborts the whole job — the
    query-killer class. This pin is WHY the package constructs maps only
    with literal distinct keys and never from unsanitized data."""
    with pytest.raises(SparkRuntimeException) as exc:
        spark.range(1).select(build().alias("m")).collect()
    assert ("NULL_MAP_KEY" in str(exc.value)) or ("DUPLICATED_MAP_KEY" in str(exc.value))


def test_duckdb_twin_edges():
    """The oracle engine agrees on the classes: lookups degrade softly
    (empty list), construction raises on null or duplicate keys — so a
    hostile-fixture row that killed a Spark map build would also kill
    the oracle, never silently diverge."""
    con = duckdb.connect()
    assert con.sql("SELECT map(['a','b'],[1,2])['zzz']").fetchone()[0] == []
    assert con.sql("SELECT map(['a'],[1])[NULL]").fetchone()[0] == []
    with pytest.raises(duckdb.Error):
        con.sql("SELECT map([NULL],[1])").fetchone()
    with pytest.raises(duckdb.Error):
        con.sql("SELECT map(['k','k'],[1,2])").fetchone()
