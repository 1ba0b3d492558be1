"""Aggregate / window-framing dialect catalog (round-11 probe axis).

The scalar probe program (probe_dialect.py, DIALECT.md) covered
expression semantics; this catalog pins the AGGREGATE and WINDOW-FRAMING
classes the oracles lean on. Measured divergence classes:

1. **corr() on a zero-variance group** — Spark under default ANSI mode
   raises DIVIDE_BY_ZERO (all quantities equal is perfectly clean data);
   DuckDB returns NULL. A CASE guard around corr() cannot help: the
   aggregate evaluates over the whole group before the projection
   applies the CASE. Escape: the guarded moment form
   ``covar_pop/(stddev_pop*stddev_pop)`` with ``var_pop > 0`` guards —
   division-free over the group, equal to corr() where defined
   (q_agg_stats; hostile lineitem rows 95001-95003).
2. **sum(BIGINT) overflow** — Spark ANSI raises ARITHMETIC_OVERFLOW;
   DuckDB silently widens to HUGEINT. Two readings inside the
   quantizable gate overflow the int64 micros sum. Escape: DECIMAL(38,0)
   accumulators (tables.micros128) — Spark's 128-bit integer sum,
   matching DuckDB's promotion exactly (hostile events rows 9501/9502).
3. **min_by/max_by with a NULL VALUE at the extremal key** — Spark
   returns the NULL (argmax semantics over all rows); DuckDB skips
   NULL-valued rows and answers from the remainder. The repo never hits
   it: every Spark-side min_by/max_by keys on a STRUCT (never NULL) and
   every oracle uses the row_number form, which keeps NULL values like
   Spark does. NULL ORDER KEYS are skipped identically (agreement).
4. **Bare min_by/max_by ties** are NONDETERMINISTIC in both engines
   (measured: different winners) — not pinnable as a divergence, so the
   repo convention stands: every argmin/argmax key is a total order
   (struct tiebreak on Spark, multi-key row_number in oracles).
5. **Cumulative windowed sum(DOUBLE)** — association order differs
   (DuckDB's segment-tree combine vs Spark's sequential accumulate), so
   catastrophic-cancellation prefixes produce different doubles. The
   integer-micros convention (now micros128) is the escape.
6. **avg(BIGINT) above 2^53** — the engines divide differently-rounded
   intermediates; one ulp apart. No oracle averages huge integers; the
   micros bridges divide exact integer sums instead.
7. **percentile over NaN-containing data** — Spark total-orders NaN
   greatest (deterministic); DuckDB's quantile selection is not
   NaN-total-ordered and returns NaN here. The repo's percentiles run
   over contract-clean columns (TPC-H numerics, integer n_chars);
   events.value percentiles would need the finite_values gate first.

Agreements pinned below (a library upgrade that breaks one is caught
here, not in a driver mismatch): the whole stats family except corr on
zero-variance and single-row groups; the rank family on ties; RANGE
frames (NULL order keys form one peer group, DESC frames, INTERVAL
frames on dates, default-frame peers, first/last_value); lead/lag
including IGNORE NULLS (syntax differs — Spark postfix, DuckDB in-arg —
semantics agree); the percentile interpolation grid on NaN-free data;
count(DISTINCT) NaN/-0.0 normalization; and UTF-8-byte string ordering
(min/max and ordered string_agg over astral/BMP edges).

This catalog IS the machine sweep for the axis (probe_dialect.py's
protocol, expressed as pytest because aggregates need table-shaped
inputs): raw forms are REQUIRED to diverge — a library upgrade that
silently heals one fails the test — and lockstep forms are REQUIRED to
agree on every battery.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F


def _duck(sql: str, rows: list[tuple], schema: str) -> list[tuple]:
    con = duckdb.connect()
    cols = [c.strip().split()[0] for c in schema.split(",")]
    types = [c.strip().split(None, 1)[1] for c in schema.split(",")]
    con.execute(
        "CREATE TABLE t (" + ", ".join(f"{c} {t}" for c, t in zip(cols, types)) + ")"
    )
    ph = ", ".join("?" for _ in cols)
    for r in rows:
        con.execute(f"INSERT INTO t VALUES ({ph})", list(r))
    out = con.execute(sql).fetchall()
    con.close()
    return out


# ---------------------------------------------------------------- class 1
ZEROVAR_ROWS = [(1, 5.0, 1.0), (1, 5.0, 2.0)]
ZV_SCHEMA = "g INTEGER, x DOUBLE, y DOUBLE"


def test_corr_zero_variance_divergence(spark):
    """Raw fact: Spark ANSI corr errors, DuckDB corr is NULL."""
    df = spark.createDataFrame(ZEROVAR_ROWS, "g int, x double, y double")
    df.createOrReplaceTempView("zv")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT corr(x, y) FROM zv GROUP BY g").collect()
    assert _duck("SELECT corr(x, y) FROM t GROUP BY g", ZEROVAR_ROWS, ZV_SCHEMA) == [
        (None,)
    ]


GUARDED_CORR_SQL = (
    "CASE WHEN var_pop(x) > 0 AND var_pop(y) > 0 "
    "THEN covar_pop(x, y) / (stddev_pop(x) * stddev_pop(y)) END"
)


def test_guarded_corr_lockstep(spark):
    """The moment form is NULL on zero variance and equals corr() (to 6
    decimals) on regular data — on BOTH engines."""
    df = spark.createDataFrame(ZEROVAR_ROWS, "g int, x double, y double")
    df.createOrReplaceTempView("zv")
    s = spark.sql(f"SELECT {GUARDED_CORR_SQL} FROM zv GROUP BY g").collect()
    d = _duck(f"SELECT {GUARDED_CORR_SQL} FROM t GROUP BY g", ZEROVAR_ROWS, ZV_SCHEMA)
    assert [tuple(r) for r in s] == d == [(None,)]

    reg = [(1, 1.0, 2.0), (1, 2.0, 5.0), (1, 4.0, 3.0)]
    df = spark.createDataFrame(reg, "g int, x double, y double")
    df.createOrReplaceTempView("reg")
    q = f"SELECT round({GUARDED_CORR_SQL}, 6) AS m, round(corr(x, y), 6) AS c FROM"
    (sm, sc) = spark.sql(f"{q} reg GROUP BY g").collect()[0]
    ((dm, dc),) = _duck(f"{q} t GROUP BY g", reg, ZV_SCHEMA)
    assert sm == sc == dm == dc


def test_stats_family_edges_agree(spark):
    """Everything except corr agrees on zero-variance AND single-row
    groups: stddev/var (samp 0/NULL, pop 0), covar, skew/kurt/regr NULL."""
    fams = [
        "stddev_samp(x)", "var_samp(x)", "stddev_pop(x)", "var_pop(x)",
        "covar_samp(x, y)", "covar_pop(x, y)", "skewness(x)", "kurtosis(x)",
        "regr_slope(y, x)", "regr_r2(y, x)",
    ]
    sel = ", ".join(fams)
    for rows in (ZEROVAR_ROWS, [(1, 5.0, 1.0)]):
        df = spark.createDataFrame(rows, "g int, x double, y double")
        df.createOrReplaceTempView("se")
        s = [tuple(r) for r in spark.sql(f"SELECT {sel} FROM se GROUP BY g").collect()]
        d = _duck(f"SELECT {sel} FROM t GROUP BY g", rows, ZV_SCHEMA)
        assert s == d, f"stats family split on {rows}: {s} vs {d}"


# ---------------------------------------------------------------- class 2
def test_sum_bigint_overflow_divergence(spark):
    """Raw fact: Spark ANSI sum(BIGINT) overflow errors; DuckDB widens."""
    rows = [(9223372036854775807,), (1,)]
    df = spark.createDataFrame(rows, "v long")
    df.createOrReplaceTempView("ov")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        spark.sql("SELECT sum(v) FROM ov").collect()
    assert _duck("SELECT sum(v) FROM t", rows, "v BIGINT") == [
        (9223372036854775808,)
    ]


def test_micros128_sum_lockstep(spark):
    """The DECIMAL(38,0) accumulator matches DuckDB's HUGEINT promotion
    exactly at the overflow edge — grouped AND windowed — including the
    divide-then-round emit (the hostile 9501/9502 shape).

    Emit-division fine print (all measured here so a version bump that
    shifts any of it is caught):

    - The DataFrame-API ``/ 1000000.0`` is DOUBLE division (Python float
      literal); a Spark-SQL literal ``1000000.0`` would be DECIMAL and
      divide exactly — one ulp apart at 1.6e19. The CAST AS DOUBLE below
      mirrors the DataFrame API; no oracle pair may be ported to
      Spark-SQL text without it.
    - Below 2^53 micros the emitted double is exact on both engines.
    - ABOVE 2^53 micros, a double emit cannot carry the total exactly;
      the two engines' 128-bit→double division pipelines then agree only
      when the exact total happens to be double-representable (the
      hostile 9501/9502 rows are CHOSEN that way: 8e18 and 1.6e19 are
      exact binaries), and can differ by ONE ULP otherwise — pinned as a
      documented residual below, same family as the round-mechanism
      split (DIALECT.md). An exact-output contract at that magnitude
      needs a 128-bit carrier column (q_rollup_cascade carries one
      internally), not a double."""
    exact = [(1, 8.0e12), (1, 8.0e12)]
    schema = "g INTEGER, value DOUBLE"
    df = spark.createDataFrame(exact, "g int, value double")
    df.createOrReplaceTempView("mk")
    grouped = (
        "SELECT round(sum(CAST(round(value * 1000000, 0) AS {acc})) "
        "/ CAST(1000000.0 AS DOUBLE), 4) AS s FROM {t} GROUP BY g"
    )
    s = [tuple(r) for r in spark.sql(grouped.format(acc="DECIMAL(38,0)", t="mk")).collect()]
    d = _duck(grouped.format(acc="BIGINT", t="t"), exact, schema)
    assert s == d == [(1.6e13,)]
    windowed = (
        "SELECT round(sum(CAST(round(value * 1000000, 0) AS {acc})) "
        "OVER (PARTITION BY g ORDER BY value, {rid}) "
        "/ CAST(1000000.0 AS DOUBLE), 4) AS s "
        "FROM {t} ORDER BY s"
    )
    sw = [
        tuple(r)
        for r in spark.sql(
            windowed.format(acc="DECIMAL(38,0)", t="mk", rid="monotonically_increasing_id()")
        ).collect()
    ]
    dw = _duck(windowed.format(acc="BIGINT", t="t", rid="rowid"), exact, schema)
    assert sw == dw == [(8.0e12,), (1.6e13,)]

    # the one-ulp residual beyond 2^53 micros on a NON-exact total:
    # Spark's DECIMAL→double and DuckDB's HUGEINT→double division land
    # one ulp apart; a 2-decimal round reconverges them here, a 4-decimal
    # round cannot (ulp at 1.6e13 is 0.002 > 1e-4)
    inexact = [(1, 8.0e12), (1, 8.0e12), (1, 5.5), (1, -2.25)]
    df = spark.createDataFrame(inexact, "g int, value double")
    df.createOrReplaceTempView("mi")
    (sv,) = spark.sql(grouped.format(acc="DECIMAL(38,0)", t="mi")).collect()[0]
    ((dv,),) = _duck(grouped.format(acc="BIGINT", t="t"), inexact, schema)
    assert sv != dv and abs(sv - dv) <= math.ulp(sv), (
        f"128-bit emit residual shifted: {sv!r} vs {dv!r}"
    )
    two = (
        "SELECT round(sum(CAST(round(value * 1000000, 0) AS {acc})) "
        "/ CAST(1000000.0 AS DOUBLE), 2) AS s FROM {t} GROUP BY g"
    )
    (sv2,) = spark.sql(two.format(acc="DECIMAL(38,0)", t="mi")).collect()[0]
    ((dv2,),) = _duck(two.format(acc="BIGINT", t="t"), inexact, schema)
    assert sv2 == dv2


# ---------------------------------------------------------------- class 3/4
MB_SCHEMA = "g INTEGER, k INTEGER, v VARCHAR"


def test_minby_null_value_divergence(spark):
    """Raw fact: Spark min_by returns the NULL value at the extremal
    key; DuckDB skips NULL-valued rows."""
    rows = [(1, 1, None), (1, 5, "z")]
    df = spark.createDataFrame(rows, "g int, k int, v string")
    df.createOrReplaceTempView("mb")
    assert spark.sql("SELECT min_by(v, k) FROM mb GROUP BY g").collect()[0][0] is None
    assert _duck("SELECT min_by(v, k) FROM t GROUP BY g", rows, MB_SCHEMA) == [("z",)]


def test_minby_null_order_key_agreement(spark):
    """NULL ORDER KEYS are skipped identically on both engines."""
    rows = [(1, None, "a"), (1, 5, "z")]
    df = spark.createDataFrame(rows, "g int, k int, v string")
    df.createOrReplaceTempView("mbk")
    s = tuple(spark.sql("SELECT min_by(v, k), max_by(v, k) FROM mbk GROUP BY g").collect()[0])
    d = _duck("SELECT min_by(v, k), max_by(v, k) FROM t GROUP BY g", rows, MB_SCHEMA)
    assert [s] == d == [("z", "z")]


def test_struct_tiebreak_matches_row_number_oracle(spark):
    """The repo's lockstep pair: Spark max_by on a struct total order ≡
    the oracle's multi-key row_number form, ties included."""
    rows = [(1, 10, "a"), (1, 10, "b"), (1, 5, "z")]
    df = spark.createDataFrame(rows, "g int, k int, v string")
    df.createOrReplaceTempView("tb")
    s = spark.sql("SELECT max_by(v, struct(k, v)) FROM tb GROUP BY g").collect()[0][0]
    d = _duck(
        "SELECT v FROM (SELECT v, row_number() OVER "
        "(PARTITION BY g ORDER BY k DESC, v DESC) AS rn FROM t) WHERE rn = 1",
        rows,
        MB_SCHEMA,
    )
    assert [(s,)] == d == [("b",)]


# ---------------------------------------------------------------- class 5
def test_windowed_double_sum_association_divergence(spark):
    """Raw fact: cumulative sum(DOUBLE) over a cancellation battery
    differs between the engines' accumulation orders; the same battery
    through integer units agrees. (The reason every micros sum exists.)"""
    vals = [1e16, 1.0, -1e16, 1.0] * 8
    rows = [(i, v) for i, v in enumerate(vals)]
    schema = "i BIGINT, v DOUBLE"
    df = spark.createDataFrame(rows, "i long, v double")
    df.createOrReplaceTempView("wd")
    q = (
        "SELECT i, sum(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS s FROM {t} ORDER BY i"
    )
    s = [tuple(r) for r in spark.sql(q.format(t="wd")).collect()]
    d = _duck(q.format(t="t"), rows, schema)
    assert s != d, "association divergence healed — re-audit the micros convention"
    qi = (
        "SELECT i, sum(CAST(v AS DECIMAL(38,0))) OVER (ORDER BY i ROWS "
        "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM {t} ORDER BY i"
    )
    si = [tuple(r) for r in spark.sql(qi.format(t="wd")).collect()]
    qd = (
        "SELECT i, sum(CAST(v AS BIGINT)) OVER (ORDER BY i ROWS "
        "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM t ORDER BY i"
    )
    di = _duck(qd, rows, schema)
    assert [(i, decimal.Decimal(x)) for i, x in si] == [
        (i, decimal.Decimal(x)) for i, x in di
    ]


# ---------------------------------------------------------------- class 6
def test_avg_bigint_beyond_2p53_divergence(spark):
    """Raw fact: avg of integers above 2^53 rounds differently."""
    rows = [(9007199254740993,), (2,)]
    df = spark.createDataFrame(rows, "v long")
    df.createOrReplaceTempView("ab")
    s = spark.sql("SELECT avg(v) FROM ab").collect()[0][0]
    (d,) = _duck("SELECT avg(v) FROM t", rows, "v BIGINT")[0]
    assert s != d, "avg rounding split healed — re-check the probe ledger"


# ---------------------------------------------------------------- class 7
def test_percentile_nan_divergence_and_clean_grid(spark):
    """Raw fact: NaN in the data splits the percentile answers; the
    NaN-free interpolation grid agrees everywhere."""
    rows = [(1.0,), (float("nan"),), (3.0,)]
    df = spark.createDataFrame(rows, "v double")
    df.createOrReplaceTempView("pn")
    s = spark.sql("SELECT percentile(v, 0.5) FROM pn").collect()[0][0]
    (d,) = _duck("SELECT quantile_cont(v, 0.5) FROM t", rows, "v DOUBLE")[0]
    assert s == 3.0 and math.isnan(d), f"NaN percentile class shifted: {s} vs {d}"

    batteries = [
        [1.0, 2.0, 3.0, 4.0],
        [10.0, 20.0],
        [42.0],
        [1.0, 1.0, 1.0, 100.0],
        [-5.0, -1.5, 3.25],
        [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
    ]
    ps = [0.0, 0.1, 0.25, 0.3, 1.0 / 3.0, 0.5, 0.9, 1.0]
    for vals in batteries:
        rows = [(v,) for v in vals]
        df = spark.createDataFrame(rows, "v double")
        df.createOrReplaceTempView("pg")
        sel_s = ", ".join(f"percentile(v, {p!r})" for p in ps)
        sel_d = ", ".join(f"quantile_cont(v, {p!r})" for p in ps)
        s = tuple(spark.sql(f"SELECT {sel_s} FROM pg").collect()[0])
        d = _duck(f"SELECT {sel_d} FROM t", rows, "v DOUBLE")[0]
        assert s == d, f"percentile grid split on {vals}: {s} vs {d}"


# ------------------------------------------------------------- agreements
RANK_ROWS = [(1, 10), (1, 10), (1, 20), (1, 30), (1, 30), (1, 30)]


def test_rank_family_ties_agree(spark):
    df = spark.createDataFrame(RANK_ROWS, "g int, k int")
    df.createOrReplaceTempView("rk")
    q = (
        "SELECT k, rank() OVER w, dense_rank() OVER w, percent_rank() OVER w, "
        "cume_dist() OVER w, ntile(4) OVER w FROM {t} "
        "WINDOW w AS (PARTITION BY g ORDER BY k) ORDER BY 1, 2, 3, 4, 5, 6"
    )
    s = [tuple(r) for r in spark.sql(q.format(t="rk")).collect()]
    d = _duck(q.format(t="t"), RANK_ROWS, "g INTEGER, k INTEGER")
    assert s == d


RANGE_ROWS = [(1, None, 1.0), (1, 10, 2.0), (1, 12, 4.0), (1, None, 8.0), (1, 20, 16.0)]
RANGE_SCHEMA = "g INTEGER, k INTEGER, v DOUBLE"


def test_range_frames_agree(spark):
    """RANGE frames: NULL order keys form ONE peer group whose frame is
    all NULL rows (both engines); DESC offsets mirror; duplicate keys
    share the default frame's peer extent."""
    df = spark.createDataFrame(RANGE_ROWS, "g int, k int, v double")
    df.createOrReplaceTempView("rf")
    for order in ("k", "k DESC"):
        q = (
            f"SELECT k, sum(v) OVER (PARTITION BY g ORDER BY {order} "
            "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM {t} "
            "ORDER BY k NULLS FIRST, s"
        )
        s = [tuple(r) for r in spark.sql(q.format(t="rf")).collect()]
        d = [(k, float(v)) for k, v in _duck(q.format(t="t"), RANGE_ROWS, RANGE_SCHEMA)]
        assert s == d, f"RANGE {order} split: {s} vs {d}"
    dup = [(1, 10, 1.0), (1, 10, 2.0), (1, 20, 4.0)]
    df = spark.createDataFrame(dup, "g int, k int, v double")
    df.createOrReplaceTempView("rf2")
    q = (
        "SELECT k, v, sum(v) OVER (PARTITION BY g ORDER BY k) AS s, "
        "last_value(v) OVER (PARTITION BY g ORDER BY k) AS lv, "
        "first_value(v) OVER (PARTITION BY g ORDER BY k ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS fv FROM {t} ORDER BY k, v"
    )
    s = [tuple(r) for r in spark.sql(q.format(t="rf2")).collect()]
    d = [
        tuple(float(x) if isinstance(x, decimal.Decimal) else x for x in r)
        for r in _duck(q.format(t="t"), dup, RANGE_SCHEMA)
    ]
    assert s == d


def test_interval_range_frame_on_date_agrees(spark):
    rows = [("2024-01-01",), ("2024-01-03",), ("2024-01-10",)]
    df = spark.createDataFrame(rows, "d string").select(F.col("d").cast("date").alias("d"))
    df.createOrReplaceTempView("dt")
    q = (
        "SELECT d, count(*) OVER (ORDER BY d RANGE BETWEEN INTERVAL 2 DAY "
        "PRECEDING AND CURRENT ROW) AS c FROM {t} ORDER BY d"
    )
    s = [tuple(r) for r in spark.sql(q.format(t="dt")).collect()]
    import datetime

    d = _duck(q.format(t="t"), [(datetime.date.fromisoformat(x),) for (x,) in rows], "d DATE")
    assert s == d


LAG_ROWS = [(1, 1, "a"), (1, 2, None), (1, 3, "c"), (1, 4, None), (1, 5, "e")]
LAG_SCHEMA = "g INTEGER, i INTEGER, v VARCHAR"


def test_lead_lag_defaults_and_ignore_nulls_agree(spark):
    """lead/lag defaults and offsets agree; IGNORE NULLS agrees
    semantically though the SYNTAX differs (Spark postfix `IGNORE NULLS`,
    DuckDB inside the argument list)."""
    spark.createDataFrame(LAG_ROWS, "g int, i int, v string").createOrReplaceTempView("lg")
    base = "SELECT i, lag(v) OVER w, lead(v, 2, 'D') OVER w, lag(v, 0) OVER w"
    tail = " FROM {t} WINDOW w AS (PARTITION BY g ORDER BY i) ORDER BY i"
    s = [
        tuple(r)
        for r in spark.sql(
            base + ", lag(v, 1) IGNORE NULLS OVER w" + tail.format(t="lg")
        ).collect()
    ]
    d = _duck(
        base + ", lag(v, 1 IGNORE NULLS) OVER w" + tail.format(t="t"),
        LAG_ROWS,
        LAG_SCHEMA,
    )
    assert s == d


def test_count_distinct_nan_and_signed_zero_agree(spark):
    rows = [(float("nan"),), (float("nan"),), (0.0,), (-0.0,), (float("inf"),)]
    df = spark.createDataFrame(rows, "v double")
    df.createOrReplaceTempView("cd")
    s = spark.sql("SELECT count(DISTINCT v) FROM cd").collect()[0][0]
    d = _duck("SELECT count(DISTINCT v) FROM t", rows, "v DOUBLE")[0][0]
    assert s == d == 3  # NaN==NaN, -0.0==0.0, inf distinct


def test_string_ordering_utf8_bytes_agree(spark):
    """min/max and ordered string_agg compare UTF-8 BYTES on both engines
    — astral chars sort above every BMP char (not UTF-16 code-unit
    order, where surrogates would sort below U+E000)."""
    vals = ["\U00010400", "", "�", "z", "\U0010FFFF", "￿"]
    rows = [(1, v) for v in vals]
    df = spark.createDataFrame(rows, "g int, v string")
    df.createOrReplaceTempView("so")
    s = spark.sql(
        "SELECT min(v), max(v), array_join(array_sort(collect_list(v)), '|') "
        "FROM so GROUP BY g"
    ).collect()[0]
    d = _duck(
        "SELECT min(v), max(v), string_agg(v, '|' ORDER BY v) FROM t GROUP BY g",
        rows,
        "g INTEGER, v VARCHAR",
    )[0]
    assert tuple(s) == d


def test_trailing_sum_difference_of_growing_frames(spark):
    """q_win_range_frame's plan-shape rewrite (round 11): Spark has no
    retractable aggregates, so a bounded sliding frame re-accumulates
    the whole frame per row — O(rows x frame-depth), a quadratic cliff
    on dense streams. The trailing sum is therefore computed as the
    difference of two GROWING frames (accumulate-only, O(rows)), with a
    count gate reproducing the sliding form's NULL semantics. This test
    pins (a) exact equality of the two forms on a battery that includes
    an ALL-NULL trailing frame preceded by non-NULL history — the case
    where a bare difference yields 0 but the sliding frame yields NULL —
    and (b) the relative cost on a dense battery: the growing-frame
    form must not be slower (back-to-back A/B, load-immune; no absolute
    wall-time bound per the load-aware test convention)."""
    import time

    rows = [
        # (g, epoch, value): non-NULL history, then an all-NULL hour
        (1, 0, 5.0), (1, 10, 7.0), (1, 5000, None), (1, 5100, None),
        (1, 9000, 2.0), (1, 9000, None), (1, 12599, 1.0), (1, 12601, 4.0),
    ]
    df = spark.createDataFrame(rows, "g int, epoch long, value double")
    df.createOrReplaceTempView("tf")
    sliding = (
        "SELECT epoch, sum(CAST(round(value * 1000000, 0) AS DECIMAL(38,0)))"
        " OVER (PARTITION BY g ORDER BY epoch RANGE BETWEEN 3600 PRECEDING"
        " AND CURRENT ROW) AS s FROM tf ORDER BY epoch, s"
    )
    diffform = (
        "SELECT epoch, CASE WHEN"
        " count(value) OVER hi - coalesce(count(value) OVER lo, 0) > 0 THEN"
        " sum(CAST(round(value * 1000000, 0) AS DECIMAL(38,0))) OVER hi"
        " - coalesce(sum(CAST(round(value * 1000000, 0) AS DECIMAL(38,0)))"
        "            OVER lo, CAST(0 AS DECIMAL(38,0))) END AS s FROM tf"
        " WINDOW hi AS (PARTITION BY g ORDER BY epoch RANGE BETWEEN"
        " UNBOUNDED PRECEDING AND CURRENT ROW),"
        " lo AS (PARTITION BY g ORDER BY epoch RANGE BETWEEN UNBOUNDED"
        " PRECEDING AND 3601 PRECEDING) ORDER BY epoch, s"
    )
    a = [tuple(r) for r in spark.sql(sliding).collect()]
    b = [tuple(r) for r in spark.sql(diffform).collect()]
    assert a == b, f"forms differ: {a} vs {b}"
    # the 5000/5100 rows sit in an all-NULL trailing hour with non-NULL
    # history: both forms must say NULL there (the class the gate exists for)
    null_epochs = [e for e, s in a if s is None]
    assert 5000 in null_epochs and 5100 in null_epochs

    # dense-battery relative cost (12k rows, every trailing window holds
    # ~3000 rows): growing-frame form must beat the sliding frame
    dense = spark.range(12_000).selectExpr(
        "1 AS g", "id AS epoch", "CAST(id % 97 AS DOUBLE) + 0.5 AS value"
    )
    dense.localCheckpoint().createOrReplaceTempView("tf")
    spark.sql(diffform).collect()  # warm codegen
    t0 = time.time(); spark.sql(sliding).collect(); t_slide = time.time() - t0
    t0 = time.time(); spark.sql(diffform).collect(); t_diff = time.time() - t0
    assert t_diff < t_slide, (
        f"growing-frame form ({t_diff:.2f}s) not faster than sliding "
        f"({t_slide:.2f}s) — retraction may have landed; re-audit the rewrite"
    )
