"""JSON parser divergence catalog (round-9 probe find).

Jackson (Spark's get_json_object) and yyjson (DuckDB's JSON reader)
give DIFFERENT ANSWERS — not errors — on four payload classes, so no
ANSI gate or try_ function catches them; they silently diverge a
cross-engine comparison one row at a time:

1. **Trailing garbage** (``{"k":1} extra``, ``{"k":1}}``): Jackson
   parses the first root value and ignores the rest; yyjson's
   ``json_valid`` is strict, so DuckDB nulls what Spark answers.
2. **Deep nesting**: Jackson's default StreamReadConstraints abort the
   whole payload at depth 1000 (999 parses, 1000 does not — pinned
   below); yyjson parses any depth, so Spark nulls what DuckDB answers.
3. **Token-length constraints**: 1001+-digit numbers (maxNumberLength
   1000) and >50000-char key names (maxNameLength) kill the payload on
   Spark only. 1000 digits and 100k-char string VALUES parse on both
   (maxStringLength is 20M).
4. **Bare NaN/Infinity literals**: yyjson accepts them
   (``json_valid`` TRUE, extraction yields ``'NaN'``); Jackson rejects
   the payload.

And the agreement worth pinning: **duplicate keys are first-wins on
BOTH engines** (no gate needed).

No Spark primitive is strict about trailing input — get_json_object,
from_json (struct and map schemas), try_parse_json and
json_object_keys all accept ``{"k":1} extra`` (pinned below) — so the
lockstep fix is the shared string-level PARSE ENVELOPE
(functions/scalars.py ``json_parseable`` / ``json_parseable_sql``):
both engines null any payload outside it before parsing. The last
tests here drive every class through the envelope on both engines and
assert identical results; hostile rows 9315-9324 pin the same classes
end-to-end through the registered queries.

Known residual (documented in the scalars.py module comment):
comma-joined multi-roots (``{"a":1},{"b":2}``) are indistinguishable
at string level from an array-of-objects interior, so they remain
Jackson-lenient/yyjson-strict and are kept out of fixtures.

Round-10 ADVICE hardening, each confirmed-divergent through the OLD
envelope before the fix (pinned in ENVELOPE_CASES below):
- ``\\s`` in the envelope was dialect-split (Java includes \\x0B, RE2
  doesn't) and broader than JSON whitespace (both include \\f, which
  neither parser accepts) — ``{"k":1}`` + VT/FF diverged. The envelope
  now uses the explicit class ``[ \\t\\r\\n]``.
- The end anchor was ``$``: Java's matches before a final line
  terminator (U+2028/U+2029/\\x85 included), so ``{"k":1}`` + U+2028
  diverged. Now ``\\z`` on both sides.
- The seam guard only caught whitespace-adjacent ``}{`` joins:
  ``{"k":1}x{"b":2}`` diverged. Now a closer-join guard: after ``}``
  or ``]``, only ``,`` ``}`` ``]``, JSON whitespace or end-of-text.
- The number gate only caught 1001+ DIGIT runs; Jackson also rejects
  FP/exp tokens >= 1002 total chars (``<600 digits>.<600 digits>``
  diverged). Now a 1001+ run of ``[0-9.eE+-]`` starting with a digit;
  legit 1001-char FP tokens are symmetric envelope false-positives.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.functions.scalars import (
    json_parseable,
    json_parseable_sql,
)

TRAILING = '{"k":1} extra'
TRAILING_BRACE = '{"k":1}}'
DEEP = lambda d: '{"k":7,"d":' + "[" * d + "]" * d + "}"  # noqa: E731
NUM = lambda n: '{"k":7,"n":' + "9" * n + "}"  # noqa: E731
NAN = '{"missing":NaN,"k":7}'
DUP = '{"k":1,"k":2}'


def _spark_k(spark, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, props string"
    )
    rows = df.select("i", F.get_json_object("props", "$.k").alias("k")).collect()
    return [r.k for r in sorted(rows, key=lambda r: r.i)]


def _duck_valid_and_k(payloads):
    con = duckdb.connect()
    out = []
    for p in payloads:
        out.append(
            con.execute(
                "SELECT json_valid(?::VARCHAR),"
                " CASE WHEN json_valid(?::VARCHAR)"
                "      THEN json_extract_string(?::VARCHAR, '$.k') END",
                [p, p, p],
            ).fetchone()
        )
    return out


def test_trailing_garbage_is_the_lenient_strict_split(spark):
    """Class 1: Jackson answers, DuckDB rejects."""
    assert _spark_k(spark, [TRAILING, TRAILING_BRACE]) == ["1", "1"]
    assert _duck_valid_and_k([TRAILING, TRAILING_BRACE]) == [
        (False, None),
        (False, None),
    ]


def test_no_spark_primitive_is_strict_on_trailing(spark):
    """The fact that forces a string-level envelope: every Spark JSON
    entry point accepts trailing garbage."""
    df = spark.createDataFrame([(TRAILING,)], "props string")
    row = df.select(
        F.get_json_object("props", "$.k").isNotNull().alias("gjo"),
        F.from_json("props", "k string").isNotNull().alias("fj_struct"),
        F.from_json("props", "map<string,string>").isNotNull().alias("fj_map"),
        F.try_parse_json("props").isNotNull().alias("variant"),
        F.json_object_keys("props").isNotNull().alias("objkeys"),
    ).collect()[0]
    assert all([row.gjo, row.fj_struct, row.fj_map, row.variant, row.objkeys])


def test_depth_constraint_is_spark_only(spark):
    """Class 2: depth 999 parses on Spark, 1000 kills the payload;
    DuckDB parses both."""
    assert _spark_k(spark, [DEEP(999), DEEP(1000)]) == ["7", None]
    assert [v for v, _ in _duck_valid_and_k([DEEP(999), DEEP(1000)])] == [True, True]


def test_number_length_constraint_is_spark_only(spark):
    """Class 3: 1000 digits parse on both; 1001 kills the payload on
    Spark only."""
    assert _spark_k(spark, [NUM(1000), NUM(1001)]) == ["7", None]
    assert [v for v, _ in _duck_valid_and_k([NUM(1000), NUM(1001)])] == [True, True]


def test_nan_literal_is_duckdb_only(spark):
    """Class 4: yyjson accepts bare NaN; Jackson rejects the payload."""
    assert _spark_k(spark, [NAN]) == [None]
    assert _duck_valid_and_k([NAN]) == [(True, "7")]


def test_duplicate_keys_are_first_wins_on_both(spark):
    assert _spark_k(spark, [DUP]) == ["1"]
    assert _duck_valid_and_k([DUP])[0][1] == "1"


def test_dollar_anchor_dialect_split_and_the_z_fix(spark):
    """Round-9 regex-dialect find: Java's $ matches BEFORE a final line
    terminator (\\n, \\r, \\r\\n); RE2's $ is end-of-text only. Spark's
    cast then trims the terminator, so the old '^-?[0-9]+$' integer gate
    turned '123\\n' into 123 on Spark and NULL on DuckDB. \\z is the
    absolute end-of-text anchor in BOTH dialects — pinned here. The
    ws_dollar probe records why the OLD \\s*$ envelope end-guard looked
    exempt: \\s* absorbs \\n/\\r before either dialect's $ evaluates —
    but Java's \\s misses U+2028/U+2029/\\x85 and its $ still matches
    before them, which is the r10 divergence class that moved the
    envelope to [ \\t\\r\\n]*\\z (see ENVELOPE_CASES)."""
    vals = ["123\n", "123\r", "123\r\n", "123"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    rows = df.select(
        "i",
        F.col("s").rlike("^-?[0-9]+$").alias("dollar"),
        F.col("s").rlike("^-?[0-9]+\\z").alias("z"),
        F.col("s").rlike("[}]?\\s*$").alias("ws_dollar"),
    ).collect()
    got = {r.i: r for r in rows}
    con = duckdb.connect()
    for i, v in enumerate(vals):
        d, z, w = con.execute(
            r"SELECT regexp_matches(?::VARCHAR, '^-?[0-9]+$'),"
            r" regexp_matches(?::VARCHAR, '^-?[0-9]+\z'),"
            r" regexp_matches(?::VARCHAR, '[}]?\s*$')",
            [v, v, v],
        ).fetchone()
        terminated = v != "123"
        # the raw split: $ diverges exactly on terminator-ended strings
        assert got[i].dollar is True
        assert d is (not terminated)
        # the fix: \z agrees everywhere
        assert got[i].z == z == (not terminated)
        # the exemption: \s*$ agrees because \s* eats the terminator
        assert got[i].ws_dollar is True and w is True


# every divergent class plus the precision pins (legit payloads that
# must SURVIVE the envelope with values intact)
ENVELOPE_CASES = [
    ("trailing", TRAILING, None),
    ("trailing_brace", TRAILING_BRACE, None),
    ("ws_multi_root", '{"k":1} {"x":2}', None),
    ("nan", NAN, None),
    ("neg_inf", '{"k":1,"v":-Infinity}', None),
    ("deep_1200", DEEP(1200), None),
    ("num_1001", NUM(1001), None),
    ("long_name_60k", '{"' + "a" * 60000 + '":1,"k":5}', None),
    # -- round-10 ADVICE classes (divergent through the OLD envelope) --
    ("vt_trailing", '{"k":1}\x0b', None),
    ("ff_trailing", '{"k":1}\x0c', None),
    ("ls_trailing", '{"k":1}\u2028', None),
    ("ps_trailing", '{"k":1}\u2029', None),
    ("nel_trailing", '{"k":1}\x85', None),
    ("x_join", '{"k":1}x{"b":2}', None),
    ("quote_join", '{"k":1}"x"', None),
    ("fp_1201", '{"k":1,"v":' + "9" * 600 + "." + "9" * 600 + "}", None),
    ("exp_1002", '{"k":1,"v":' + "9" * 600 + "e" + "9" * 401 + "}", None),
    # both parsers ACCEPT a 1001-char FP token; the envelope nulls it
    # symmetrically by design (the gate is run-length, not token-parse)
    ("fp_1001_sym", '{"k":1,"v":' + "9" * 500 + "." + "9" * 500 + "}", None),
    # -- precision pins: must SURVIVE with k intact on both engines --
    ("legit_nested", '{"k":23,"d":{"a":[1,{"b":2}]}}', "23"),
    ("arr_of_objs", '{"k":24,"l":[{"a":1},{"b":2}]}', "24"),
    ("num_1000", NUM(1000), "7"),
    ("fp_1000_ok", '{"k":1,"v":' + "9" * 499 + "." + "9" * 500 + "}", "1"),
    ("exp_1000_ok", '{"k":1,"v":' + "9" * 600 + "e" + "9" * 399 + "}", "1"),
    ("neg_1000_ok", '{"k":1,"v":-' + "9" * 1000 + "}", "1"),
    ("legit_ws", '\t{"k":3}\r\n', "3"),
    ("closers_then_commas", '{"k":6,"a":[1] ,"b":{"c":2} ,"d":3}', "6"),
    ("dup_first_wins", DUP, "1"),
    ("clean", '{"k":9}', "9"),
]


def test_envelope_closes_every_class_identically(spark):
    """Both engines, reading through json_parseable/json_parseable_sql,
    produce the SAME k for every divergent class (NULL) and every
    precision pin (the value)."""
    names = [n for n, _, _ in ENVELOPE_CASES]
    payloads = [p for _, p, _ in ENVELOPE_CASES]
    want = [w for _, _, w in ENVELOPE_CASES]

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, props string"
    )
    rows = df.select(
        "i", F.get_json_object(json_parseable("props"), "$.k").alias("k")
    ).collect()
    got_spark = [r.k for r in sorted(rows, key=lambda r: r.i)]

    con = duckdb.connect()
    g = json_parseable_sql("?::VARCHAR")
    nparams = g.count("?::VARCHAR")
    got_duck = [
        con.execute(
            f"SELECT CASE WHEN json_valid(p) THEN json_extract_string(p, '$.k') END"
            f" FROM (SELECT {g} AS p)",
            [p] * nparams,
        ).fetchone()[0]
        for p in payloads
    ]

    bad = [
        (n, s, d, w)
        for n, s, d, w in zip(names, got_spark, got_duck, want)
        if not (s == d == w)
    ]
    assert not bad, f"envelope mismatches (name, spark, duck, want): {bad}"
