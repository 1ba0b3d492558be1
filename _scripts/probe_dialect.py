"""Scalar-dialect sweep: run a hostile input battery through the
Spark/DuckDB expression pairs the oracles rely on and report any
divergence outside the known-class list.

Systematizes the r9/r10 probe habit (the $-anchor, JSON-envelope,
case-mapping, trim-Zs and round-mechanism finds were each one axis of
this sweep, done by hand). Run it whenever a NEW scalar expression
pair lands in an oracle, or on a pyspark/duckdb version bump:

    python /root/repo/_scripts/probe_dialect.py

Exit 0 = every pair agrees on every input EXCEPT the documented
known-divergent raw forms (listed in KNOWN_DIVERGENT with the class
that explains them — those are REQUIRED to diverge so a library
upgrade that silently heals or shifts a class is also a finding).
Exit 1 = an undocumented divergence: investigate, fix in lockstep or
document, and extend the relevant edge catalog.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from graph_vulcan_assets_spark.functions.scalars import (  # noqa: E402
    ascii_fold_lower,
    ascii_fold_lower_sql,
    ascii_only,
    ascii_only_sql,
    json_parseable,
    json_parseable_sql,
)

# ---------------------------------------------------------------- inputs
STRINGS = [
    "plain ascii",
    "",
    " padded ",
    "\xa0nbsp\xa0",            # Zs edges
    "　ideographic　",
    "straße",                  # full-vs-simple case classes
    "ﬁle ﬆop",
    "İstanbul",
    "ΟΔΟΣ",
    "école Ωμέγα Москва",      # case-agreement pins
    "\U00010400 astral",
    "123\n",                   # terminator-ended (the $ class)
    "123\r\n",
    "-45 ",               # Java line terminators
    "x\x85y",
    "a😀b",                    # astral indexing
    "é combining",
    "tab\tand\nnewline",
    "100 200 300",
    "-0042",
    "9" * 1000,
    "quote ' backslash \\ pct %",
]
JSONS = [
    '{"k":1}',
    '{"k":1} extra',
    '{"k":1}\x0b',
    '{"k":1} ',
    '{"k":1}x{"b":2}',
    '{"k":1,"v":' + "9" * 600 + "." + "9" * 600 + "}",
    '{"k":"abc"}',
    '{"missing":NaN,"k":7}',
    "[]",
    "not json",
]
DOUBLES = [0.0, -0.0, 1.005, 2.675, 0.5, -1.5, 1e308, 1e-308, 123.456]
# math-domain battery: negatives/zero are QUERY-KILLERS on the DuckDB
# side (sqrt/ln raise Out of Range) while Spark yields NaN/NULL — the
# class behind the repo convention of guarding every data-derived
# sqrt/ln argument (variance > 0, counts + 1, self-dot-products)
MATHS = [4.0, 0.0, -1.0, -1e-18, float("nan"), 1e308]

# ------------------------------------------------------- expression pairs
# (name, spark_fn(col)->Column, duck_sql(param_expr)->str, input battery)
PAIRS = [
    # raw engine forms — REQUIRED to diverge on their documented classes
    ("raw_upper", lambda c: F.upper(c), lambda e: f"upper({e})", STRINGS),
    ("raw_lower", lambda c: F.lower(c), lambda e: f"lower({e})", STRINGS),
    ("raw_trim_1arg", lambda c: F.trim(c), lambda e: f"trim({e})", STRINGS),
    (
        "raw_dollar_anchor",
        lambda c: c.rlike("[0-9]$"),
        lambda e: f"regexp_matches({e}, '[0-9]$')",
        STRINGS,
    ),
    (
        "raw_round2",
        lambda c: F.round(c, 2),
        lambda e: f"round({e}, 2)",
        DOUBLES,
    ),
    (
        "raw_get_json_k",
        lambda c: F.get_json_object(c, "$.k"),
        lambda e: f"CASE WHEN json_valid({e}) THEN json_extract_string({e}, '$.k') END",
        JSONS,
    ),
    # lockstep forms — REQUIRED to agree on every input
    (
        "gated_upper",
        lambda c: F.when(ascii_only(c), F.upper(c)),
        lambda e: f"CASE WHEN {ascii_only_sql(e)} THEN upper({e}) END",
        STRINGS,
    ),
    (
        "gated_lower",
        lambda c: F.when(ascii_only(c), F.lower(c)),
        lambda e: f"CASE WHEN {ascii_only_sql(e)} THEN lower({e}) END",
        STRINGS,
    ),
    (
        "fold_lower",
        lambda c: ascii_fold_lower(c),
        lambda e: ascii_fold_lower_sql(e),
        STRINGS,
    ),
    ("trim_space", lambda c: F.trim(c), lambda e: f"trim({e}, ' ')", STRINGS),
    (
        "z_anchor",
        lambda c: c.rlike("[0-9]\\z"),
        lambda e: f"regexp_matches({e}, '[0-9]\\z')",
        STRINGS,
    ),
    (
        "envelope_json_k",
        lambda c: F.get_json_object(json_parseable(c), "$.k"),
        lambda e: (
            f"CASE WHEN json_valid({json_parseable_sql(e)}) "
            f"THEN json_extract_string({json_parseable_sql(e)}, '$.k') END"
        ),
        JSONS,
    ),
    (
        "int_gate_cast",
        lambda c: F.when(c.rlike("^-?[0-9]+\\z"), c.try_cast("long")),
        lambda e: (
            f"CASE WHEN regexp_matches({e}, '^-?[0-9]+\\z') "
            f"THEN TRY_CAST({e} AS BIGINT) END"
        ),
        STRINGS,
    ),
    ("char_len", lambda c: F.length(c).cast("long"), lambda e: f"length({e})", STRINGS),
    (
        "byte_len",
        lambda c: F.octet_length(c).cast("long"),
        lambda e: f"strlen({e})",
        STRINGS,
    ),
    ("substr_2_3", lambda c: F.substring(c, 2, 3), lambda e: f"substr({e}, 2, 3)", STRINGS),
    (
        "split_size",
        lambda c: F.size(F.split(c, " ")).cast("long"),
        lambda e: f"len(string_split({e}, ' '))",
        STRINGS,
    ),
    ("md5", lambda c: F.md5(c), lambda e: f"md5({e})", STRINGS),
    # math domain edges — raw forms are REQUIRED to split NaN/NULL-vs-
    # error on non-positive input; the guarded forms (the convention
    # every oracle uses) must agree everywhere
    ("raw_sqrt", lambda c: F.sqrt(c), lambda e: f"sqrt({e})", MATHS),
    ("raw_ln", lambda c: F.log(c), lambda e: f"ln({e})", MATHS),
    (
        "guarded_sqrt",
        lambda c: F.when(c >= 0, F.sqrt(c)),
        lambda e: f"CASE WHEN {e} >= 0 THEN sqrt({e}) END",
        MATHS,
    ),
    (
        "guarded_ln",
        lambda c: F.when(c > 0, F.log(c)),
        lambda e: f"CASE WHEN {e} > 0 THEN ln({e}) END",
        MATHS,
    ),
]


def _key(name: str, val) -> tuple[str, str]:
    if isinstance(val, str) and len(val) > 60:
        return (name, "huge-fp")
    if isinstance(val, str):
        return (name, val.encode("unicode_escape").decode("ascii"))
    return (name, repr(val))


# (pair, input) combos with a DOCUMENTED divergence class -- these MUST
# diverge; anything else diverging is a new finding. Written as input
# LITERALS and normalized through the same _key() the sweep uses.
_RAW_KNOWN = {
    ("raw_upper", "stra\xdfe"): "full-vs-simple case mapping (sharp s)",
    ("raw_upper", "\ufb01le \ufb06op"): "ligature expansion",
    ("raw_lower", "\u0130stanbul"): "dotted-I combining mark",
    ("raw_lower", "\u039f\u0394\u039f\u03a3"): "final sigma",
    ("raw_trim_1arg", "\xa0nbsp\xa0"): "Zs trim",
    ("raw_trim_1arg", "\u3000ideographic\u3000"): "Zs trim",
    ("raw_dollar_anchor", "123\n"): "Java $ before terminator",
    ("raw_dollar_anchor", "123\r\n"): "Java $ before terminator",
    ("raw_dollar_anchor", "-45\u2028"): "Java $ before terminator",
    ("raw_round2", 1.005): "exact-expansion vs scale-then-round",
    ("raw_get_json_k", '{"k":1} extra'): "Jackson lenient trailing",
    ("raw_get_json_k", '{"k":1}\x0b'): "Jackson lenient trailing",
    ("raw_get_json_k", '{"k":1}\u2028'): "Jackson lenient trailing",
    ("raw_get_json_k", '{"k":1}x{"b":2}'): "Jackson lenient multi-root",
    ("raw_get_json_k", "huge-fp"): "StreamReadConstraints number length",
    ("raw_get_json_k", '{"missing":NaN,"k":7}'): "yyjson NaN acceptance",
    ("raw_sqrt", -1.0): "NaN vs Out-of-Range error (query-killer)",
    ("raw_sqrt", -1e-18): "NaN vs Out-of-Range error (query-killer)",
    ("raw_ln", 0.0): "NULL vs Out-of-Range error (query-killer)",
    ("raw_ln", -1.0): "NULL vs Out-of-Range error (query-killer)",
    ("raw_ln", -1e-18): "NULL vs Out-of-Range error (query-killer)",
}
KNOWN_DIVERGENT = {
    ((n, s) if s == "huge-fp" else _key(n, s)): why
    for (n, s), why in _RAW_KNOWN.items()
}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("probe-dialect")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    unexpected: list[str] = []
    healed: list[str] = []
    seen_known: set[tuple[str, str]] = set()

    def eq(a, b) -> bool:
        if a is None or b is None:
            return a is b
        if isinstance(a, float) and isinstance(b, float):
            return a == b or (a != a and b != b)  # NaN == NaN here
        return a == b

    for name, sfn, dfn, battery in PAIRS:
        typ = "double" if battery in (DOUBLES, MATHS) else "string"
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(battery)], f"i long, v {typ}"
        )
        rows = df.select("i", sfn(F.col("v")).alias("r")).collect()
        got = {r.i: r.r for r in rows}
        param = "?::DOUBLE" if typ == "double" else "?::VARCHAR"
        sql = dfn(param)
        # count placeholder OCCURRENCES, not bare '?' — envelope regexes
        # legitimately contain '?' quantifiers
        n = sql.count(param)
        for i, v in enumerate(battery):
            try:
                (dv,) = con.execute(f"SELECT {sql}", [v] * n).fetchone()
            except Exception as exc:  # the DuckDB query-killer class
                dv = f"<ERROR: {type(exc).__name__}>"
            sv = got[i]
            agree = eq(sv, dv)
            key = _key(name, v)
            known = key in KNOWN_DIVERGENT
            if known:
                seen_known.add(key)
            if not agree and not known:
                unexpected.append(f"{name} on {key[1]}: spark={sv!r} duck={dv!r}")
            if agree and known:
                healed.append(f"{name} on {key[1]} no longer diverges ({KNOWN_DIVERGENT[key]})")

    missing = set(KNOWN_DIVERGENT) - seen_known
    for m in sorted(missing):
        healed.append(f"known-divergent case never evaluated: {m}")

    for line in unexpected:
        print("UNEXPECTED DIVERGENCE:", line)
    for line in healed:
        print("CLASS SHIFTED:", line)
    print(
        f"\npairs: {len(PAIRS)}, unexpected: {len(unexpected)}, "
        f"shifted/healed: {len(healed)}"
    )
    return 1 if unexpected or healed else 0


if __name__ == "__main__":
    raise SystemExit(main())
