"""Event-time domain gates and gate-visibility reports (round 7).

The round-6 blanket [1900, 2200) gate silently dropped VALID far-future
data (ADVICE r6 high): the reference framework treats 9999-12-12 as a
legitimate in-band "Unexpired" sentinel (inventory.go:31) and would
process a year-2300 event. Round 7 splits the gate into the
REPRESENTABLE domain (default — drops only what the engines genuinely
cannot process or agree on) and the BOUNDED domain (the data contract of
spine-sized / derived-instant-emitting / streaming-stateful operators).
These tests pin the split and the drop-count visibility helpers.
"""

from __future__ import annotations

from graph_vulcan_assets_spark import tables


def _ts_frame(spark):
    return spark.sql(
        """
        SELECT * FROM VALUES
          (1, TIMESTAMP '0001-01-01 00:00:00'),
          (2, TIMESTAMP '1700-01-01 06:00:00'),
          (3, TIMESTAMP '2024-01-01 00:00:00'),
          (4, TIMESTAMP '2300-06-15 12:34:56'),
          (5, TIMESTAMP '9999-12-12 00:00:00'),
          (6, TIMESTAMP '9999-12-31 23:59:59.999999'),
          (7, CAST(NULL AS TIMESTAMP))
        AS t(id, ts)
        """
    )


def test_representable_domain_keeps_reference_sentinel(spark):
    """The default gate must pass the reference's far-future sentinel
    convention (9999-12-12), any representable future event, pre-1900
    post-reform dates, and NULLs — and drop only the ancient class that
    breaks the calendar rebase / Python representability."""
    df = _ts_frame(spark)
    kept = {
        r["id"] for r in tables.plausible_times(df).select("id").collect()
    }
    assert kept == {2, 3, 4, 5, 6, 7}  # only the year-1 row drops


def test_bounded_domain_is_narrow_and_opt_in(spark):
    df = _ts_frame(spark)
    kept = {r["id"] for r in tables.bounded_times(df).select("id").collect()}
    assert kept == {3, 7}  # 2024 + NULL; ancient AND far-future drop


def test_ts_dead_letter_is_exact_complement(spark):
    df = _ts_frame(spark)
    dead = {r["id"] for r in tables.ts_dead_letter(df).select("id").collect()}
    assert dead == {1}
    dead_b = {
        r["id"]
        for r in tables.ts_dead_letter(df, bounded=True).select("id").collect()
    }
    assert dead_b == {1, 2, 4, 5, 6}  # NULLs are never dead-lettered


def test_gate_report_counts(spark):
    df = _ts_frame(spark).selectExpr(
        "id", "ts", "CASE WHEN id = 3 THEN CAST('nan' AS DOUBLE) ELSE 1.0 END AS value"
    )
    row = tables.gate_report(df).collect()[0]
    assert row["n_rows"] == 7
    assert row["n_ts_unrepresentable"] == 1
    assert row["n_ts_out_of_bounded"] == 5
    assert row["n_value_not_quantizable"] == 1


def test_embedding_gate_report_counts(spark):
    from graph_vulcan_assets_spark.llm.embeddings import embedding_gate_report

    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1, array_repeat(CAST(1.0 AS FLOAT), 64)),
          (2, array_repeat(CAST(0.0 AS FLOAT), 64)),
          (3, array_repeat(CAST('nan' AS FLOAT), 64)),
          (4, CAST(NULL AS ARRAY<FLOAT>)),
          (5, array_repeat(CAST(1.0 AS FLOAT), 3))
        AS t(vec_id, embedding)
        """
    )
    row = embedding_gate_report(df).collect()[0]
    assert row["n_vectors"] == 5
    assert row["n_dropped_finite_gate"] == 3  # nan, NULL, wrong-dim
    assert row["n_zero_vectors"] == 1


def test_domain_bounds_are_env_configurable():
    """The bounds are module constants read from the environment at import
    (documented contract) — pin the default values so an accidental edit
    to either side of a lockstep oracle pair is visible."""
    assert tables.TS_LO == "1583-01-01"
    assert tables.TS_HI == "9999-12-31 23:59:59.999999"
    assert tables.BOUNDED_TS_LO == "1900-01-01"
    assert tables.BOUNDED_TS_HI == "2200-01-01"
