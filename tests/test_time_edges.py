"""Time-edge dialect catalog (round-11 probe axis, second sweep).

Epoch arithmetic looked aligned — both engines floor timestamps to
seconds — but the probe found the agreement is REPRESENTATION-deep,
not semantic:

1. **DuckDB ``epoch()`` is a DOUBLE.** Its ulp at year-1583 magnitude
   (1.2e10 s) and year-9999 magnitude (2.5e11 s) exceeds one
   microsecond, so ``floor(epoch(ts))`` on a fractional-second
   timestamp there is off by ONE SECOND from the true floor (measured:
   1583-01-01 00:00:00.999999 → -12212553599, true -12212553600;
   9999-12-31 23:59:59.999999 → 253402300800, true 253402300799 — the
   latter inside the repo's valid far-future domain). Spark's
   ``CAST(ts AS LONG)`` is exact integer-micros floor everywhere
   (measured: 1969-12-31 23:59:59.5 → -1, i.e. FLOOR, not
   truncate-toward-zero).
2. **DuckDB ``//`` truncates toward zero on negatives**, so
   ``epoch_us(ts) // 1000000`` is off by one second for every
   pre-1970 fractional timestamp.
3. **The sessionizer gap forms differed**: Spark computes
   floor-second differences (cast-long subtraction; the streaming
   Python path's ``t // 1_000_000`` is the same floor) while the old
   oracles subtracted raw fractional ``epoch()`` values — a gap whose
   floor is exactly the 1800 s threshold with increasing sub-second
   fraction (e.g. .25 → 1800.75) split the session on the oracle side
   only. Latent because the boundary slice is thin, not because the
   forms agree.

Escape for all three: ``tables.epoch_sec_sql`` — exact BIGINT
floor-division of ``epoch_us`` (subtract the sign-safe positive
remainder, then divide exactly) — used by every epoch-second oracle
(q_win_range_frame, q_sessionize, q_stream_sessionize). Hostile events
rows 9503-9505 pin the classes end-to-end.
"""

from __future__ import annotations

import datetime

import duckdb

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.tables import epoch_sec_sql

BATTERY = [
    "1583-01-01 00:00:00",
    "1583-01-01 00:00:00.000001",
    "1583-01-01 00:00:00.999999",
    "1700-01-01 06:00:00.999999",
    "1899-12-31 23:59:59.000001",
    "1969-12-31 23:59:59.5",
    "1970-01-01 00:00:00.5",
    "2024-06-15 12:34:56.789",
    "2262-04-11 23:47:16.854775",
    "9999-12-12 00:00:00",
    "9999-12-31 23:59:59.999999",
]


def _spark_floor_secs(spark):
    rows = [(datetime.datetime.fromisoformat(c),) for c in BATTERY]
    df = spark.createDataFrame(rows, "ts timestamp")
    return [r[0] for r in df.select(F.col("ts").cast("long")).collect()]


def _duck(expr: str) -> list[int]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t(ts TIMESTAMP)")
    for c in BATTERY:
        con.execute("INSERT INTO t VALUES (?)", [datetime.datetime.fromisoformat(c)])
    out = [r[0] for r in con.execute(f"SELECT {expr} FROM t").fetchall()]
    con.close()
    return out


def test_spark_timestamp_cast_floors(spark):
    """Spark's cast is FLOOR (not truncate-toward-zero): -0.5 s → -1."""
    secs = dict(zip(BATTERY, _spark_floor_secs(spark)))
    assert secs["1969-12-31 23:59:59.5"] == -1
    assert secs["1583-01-01 00:00:00.999999"] == -12212553600
    assert secs["9999-12-31 23:59:59.999999"] == 253402300799


def test_raw_floor_epoch_divergence(spark):
    """Raw fact: floor(epoch()) loses one second to double rounding at
    year-1583 and year-9999 magnitudes. A DuckDB release that changes
    epoch()'s type or precision shifts this class — re-audit then."""
    s = _spark_floor_secs(spark)
    d = _duck("CAST(floor(epoch(ts)) AS BIGINT)")
    split = {c: (sv, dv) for c, sv, dv in zip(BATTERY, s, d) if sv != dv}
    assert set(split) == {
        "1583-01-01 00:00:00.999999",
        "9999-12-31 23:59:59.999999",
    }, f"floor(epoch) divergence set shifted: {split}"


def test_intdiv_truncation_divergence():
    """Raw fact: DuckDB // truncates toward zero — pre-1970 fractional
    seconds come out one second high."""
    d = _duck("epoch_us(ts) // 1000000")
    got = dict(zip(BATTERY, d))
    assert got["1969-12-31 23:59:59.5"] == 0  # true floor is -1
    assert got["1583-01-01 00:00:00.999999"] == -12212553599  # true -12212553600


def test_epoch_sec_sql_matches_spark_everywhere(spark):
    """The lockstep form: exact BIGINT floor-division agrees with
    Spark's cast on the whole domain battery."""
    s = _spark_floor_secs(spark)
    d = _duck(epoch_sec_sql("ts"))
    assert s == d, f"epoch_sec_sql split: {list(zip(BATTERY, s, d))}"
    con = duckdb.connect()
    (t,) = con.execute(
        f"SELECT typeof({epoch_sec_sql('ts')}) FROM (SELECT TIMESTAMP '2024-01-01' AS ts) t"
    ).fetchone()
    assert t == "BIGINT"  # not DOUBLE — the whole point


def test_gap_forms_on_the_session_boundary(spark):
    """The sessionizer class: a gap of floor-exactly-1800 s with
    increasing fraction (raw 1800.5). Spark's floor-second gap says
    same-session; the OLD raw-epoch oracle said new-session; the
    epoch_sec_sql form matches Spark."""
    t1 = datetime.datetime.fromisoformat("2024-02-01 00:00:00.25")
    t2 = datetime.datetime.fromisoformat("2024-02-01 00:30:00.75")
    df = spark.createDataFrame([(t1,), (t2,)], "ts timestamp")
    [a, b] = sorted(r[0] for r in df.select(F.col("ts").cast("long")).collect())
    assert b - a == 1800  # Spark floor gap: NOT > 1800 → same session

    con = duckdb.connect()
    con.execute("CREATE TABLE t(ts TIMESTAMP)")
    con.execute("INSERT INTO t VALUES (?), (?)", [t1, t2])
    (raw_gap,) = con.execute("SELECT max(epoch(ts)) - min(epoch(ts)) FROM t").fetchone()
    assert raw_gap > 1800  # the old oracle form split here
    (exact_gap,) = con.execute(
        f"SELECT max({epoch_sec_sql('ts')}) - min({epoch_sec_sql('ts')}) FROM t"
    ).fetchone()
    assert exact_gap == 1800  # lockstep with Spark


def test_epoch_sec_sql_property_random_domain():
    """Property (hypothesis): on ARBITRARY microsecond instants across
    the full representable domain, the DuckDB form equals Python's exact
    integer floor — pure-engine check, no Spark needed (Spark's cast is
    pinned against the same floor in the battery tests above)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    lo = int(datetime.datetime(1583, 1, 1).timestamp()) * 1_000_000
    hi = int(datetime.datetime(9999, 12, 31, 23, 59, 59).timestamp()) * 1_000_000

    con = duckdb.connect()
    expr = epoch_sec_sql("make_timestamp(?)")
    # one placeholder per interpolation site of the helper
    n_params = expr.count("?")

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=lo, max_value=hi))
    def check(us: int) -> None:
        (got,) = con.execute(f"SELECT {expr}", [us] * n_params).fetchone()
        assert got == us // 1_000_000, (us, got)

    check()
    con.close()


def test_sliding_window_alignment_pre1970(spark):
    """The sliding-bucket class: DuckDB's // truncates toward zero, so a
    pre-1970 non-slide-aligned timestamp lands one window LATE in the
    old oracle index while Spark's window() floor-aligns. Pins the raw
    divergence and the floor_div_sql lockstep (hostile row 9506)."""
    from graph_vulcan_assets_spark.tables import floor_div_sql

    t = datetime.datetime.fromisoformat("1700-01-01 06:00:00.5")
    df = spark.createDataFrame([(t,)], "ts timestamp")
    spark_starts = sorted(
        r[0]
        for r in df.select(
            F.window("ts", "2 hours", "30 minutes").alias("w")
        ).select(F.col("w.start")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(ts TIMESTAMP)")
    con.execute("INSERT INTO t VALUES (?)", [t])
    raw = sorted(
        r[0]
        for r in con.execute(
            "SELECT make_timestamp(((epoch_us(ts) // 1000 // 1800000 - i)"
            " * 1800000) * 1000) FROM t, unnest(range(4)) AS u(i)"
        ).fetchall()
    )
    fixed = sorted(
        r[0]
        for r in con.execute(
            f"SELECT make_timestamp((({floor_div_sql('epoch_us(ts)', 1_800_000_000)}"
            " - i) * 1800000) * 1000) FROM t, unnest(range(4)) AS u(i)"
        ).fetchall()
    )
    con.close()
    assert raw != spark_starts, "truncation class healed — re-audit the ledger"
    assert fixed == spark_starts, f"floor_div lockstep split: {fixed} vs {spark_starts}"
