"""Unicode case-mapping divergence catalog (round-10 probe find).

Java's String case conversion (Spark ``upper``/``lower``) applies the
FULL Unicode case mapping; DuckDB's utf8proc applies the SIMPLE
one-to-one mapping. Four measured divergence classes:

1. **Sharp s**: ``upper('ß')`` → ``'SS'`` (Java full) vs ``'ẞ'``
   (utf8proc simple, U+1E9E).
2. **Ligatures** (ﬁ ﬂ ﬆ …): Java expands (``'FI'``), utf8proc leaves
   them unchanged (no simple uppercase exists).
3. **Dotted capital İ** (U+0130): Java ``lower`` → ``'i'`` + COMBINING
   DOT ABOVE (full mapping), utf8proc → plain ``'i'``.
4. **Final sigma**: Java is context-sensitive (``'ΟΔΟΣ'`` → ``'οδος'``,
   word-final ς), utf8proc maps Σ → σ everywhere.

And the agreements worth pinning (no gate needed): Latin-1 accents,
Greek/Cyrillic simple pairs, astral case pairs (Deseret), and the
compatibility singletons Kelvin/Angstrom/micro all map identically.

Lockstep escapes (functions/scalars.py, chosen per site):

- ``ascii_only`` gate (octet_length = char length ⇔ pure ASCII, where
  the mappings are identical): q_str_funcs' up/lo — real upper/lower
  semantics, one symmetric NULL outside the agreed domain.
- ``ascii_fold_lower`` (translate A-Z → a-z, identical on both engines
  for EVERY input): q_text_fingerprint and q_pii_redact — md5-feeding
  canonicalization that must stay DEFINED on multilingual text.

Hostile customer rows 9404-9407 pin the classes end-to-end through the
registered queries.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.functions.scalars import (
    ascii_fold_lower,
    ascii_fold_lower_sql,
    ascii_only,
    ascii_only_sql,
)

# (name, input, spark_upper, duck_upper, spark_lower, duck_lower)
DIVERGENT = [
    ("sharp_s", "straße", "STRASSE", "STRAẞE", "straße", "straße"),
    ("fi_ligature", "ﬁle", "FILE", "ﬁLE", "ﬁle", "ﬁle"),
    ("st_ligature", "beﬆ", "BEST", "BEﬆ", "beﬆ", "beﬆ"),
    ("dotted_I", "İstanbul", "İSTANBUL", "İSTANBUL", "i̇stanbul", "istanbul"),
    ("final_sigma", "ΟΔΟΣ", "ΟΔΟΣ", "ΟΔΟΣ", "οδος", "οδοσ"),
]

# inputs where the engines AGREE (pinned so a library upgrade that
# breaks the agreement is caught here, not in a driver mismatch)
AGREE = ["école", "Ωμέγα", "Москва", "\U00010400", "K", "Å", "µ", "ascii only"]


def _both_cases(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    rows = df.select(
        "i", F.upper("s").alias("u"), F.lower("s").alias("l")
    ).collect()
    got = {r.i: (r.u, r.l) for r in rows}
    con = duckdb.connect()
    duck = [con.execute("SELECT upper(?), lower(?)", [v, v]).fetchone() for v in vals]
    return [got[i] for i in range(len(vals))], duck


def test_case_mapping_divergence_classes(spark):
    """The raw engine facts that force the gates: full-vs-simple Unicode
    case mapping splits on exactly these classes."""
    vals = [v for _, v, *_ in DIVERGENT]
    sp, du = _both_cases(spark, vals)
    for (name, _, su, duu, sl, dul), (gu, gl), (hu, hl) in zip(DIVERGENT, sp, du):
        assert gu == su, f"{name}: spark upper changed: {gu!r} != {su!r}"
        assert hu == duu, f"{name}: duck upper changed: {hu!r} != {duu!r}"
        assert gl == sl, f"{name}: spark lower changed: {gl!r} != {sl!r}"
        assert hl == dul, f"{name}: duck lower changed: {hl!r} != {dul!r}"
    # at least one side of every row differs — otherwise the class is
    # no longer divergent and the gate could be reconsidered
    for (name, _, su, duu, sl, dul) in DIVERGENT:
        assert su != duu or sl != dul, f"{name} no longer diverges"


def test_case_mapping_agreement_pins(spark):
    sp, du = _both_cases(spark, AGREE)
    for v, (su, sl), (duu, dul) in zip(AGREE, sp, du):
        assert su == duu and sl == dul, (
            f"engines now disagree on {v!r}: spark=({su!r},{sl!r}) "
            f"duck=({duu!r},{dul!r}) — extend the gate"
        )


def test_ascii_gate_agrees_everywhere(spark):
    """Through the ascii_only gate both engines produce the same value
    for every divergent AND agreeing input: the cased value on pure
    ASCII, NULL otherwise."""
    vals = [v for _, v, *_ in DIVERGENT] + AGREE
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    rows = df.select(
        "i",
        F.when(ascii_only("s"), F.upper("s")).alias("u"),
        F.when(ascii_only("s"), F.lower("s")).alias("l"),
    ).collect()
    got = {r.i: (r.u, r.l) for r in rows}
    con = duckdb.connect()
    g = ascii_only_sql("?::VARCHAR")
    n = g.count("?::VARCHAR")
    for i, v in enumerate(vals):
        duu, dul = con.execute(
            f"SELECT CASE WHEN {g} THEN upper(?) END,"
            f" CASE WHEN {g} THEN lower(?) END",
            [v] * n + [v] + [v] * n + [v],
        ).fetchone()
        assert got[i] == (duu, dul), f"gated case mismatch on {v!r}"
        if v == "ascii only":
            assert got[i] == ("ASCII ONLY", "ascii only")
        if any(ord(c) > 127 for c in v):
            assert got[i] == (None, None)


def test_ascii_fold_agrees_everywhere(spark):
    """translate-based fold: identical on both engines for every input,
    non-ASCII chars verbatim — the md5-feeding canonicalization form."""
    vals = [v for _, v, *_ in DIVERGENT] + AGREE + ["MiXeD ÉÇascii"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    rows = df.select("i", ascii_fold_lower("s").alias("f")).collect()
    got = {r.i: r.f for r in rows}
    con = duckdb.connect()
    for i, v in enumerate(vals):
        (duf,) = con.execute(
            f"SELECT {ascii_fold_lower_sql('?::VARCHAR')}", [v]
        ).fetchone()
        assert got[i] == duf, f"fold mismatch on {v!r}: {got[i]!r} != {duf!r}"
    # semantics pin: ASCII letters fold, everything else verbatim
    assert got[len(vals) - 1] == "mixed ÉÇascii"
