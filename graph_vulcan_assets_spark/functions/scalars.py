"""Scalar function families (SURVEY.md §2.8).

Every scalar the reference computes — string splits/prefix strips/sprintf
(vulcan/vulcan.go:128,165-166,169; cmd/graph-vulcan-assets/main.go:258),
RFC3339 time handling (inventory/inventory.go:676-685), int casts
(vulcan/vulcan.go:174), conditional branching (main.go:151-164) and JSON
encode/decode (vulcan/vulcan.go:105) — plus the array/map families the
engine needs for annotations and metadata folds.

All of these are built-in Catalyst expressions: JVM-side, codegen'd,
null-safe. No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# Round-10 probe find: Unicode case mapping is a DIALECT SPLIT between
# the engines. Java's String case conversion (Spark upper/lower) applies
# the FULL Unicode mapping — 'ß'→'SS', 'ﬁ'→'FI', 'İ'→'i'+COMBINING DOT,
# context-sensitive final sigma ('ΟΔΟΣ'→'οδος') — while DuckDB's
# utf8proc applies the SIMPLE one-to-one mapping ('ß'→'ẞ', 'ﬁ'→'ﬁ',
# 'İ'→'i', 'ΟΔΟΣ'→'οδοσ'). All four classes measured divergent
# (tests/test_case_edges.py pins them); plain accents, Greek, Cyrillic
# and astral case pairs agree. Two lockstep escapes, chosen per site:
#   - ascii_case_only: a gate (octet_length = char length ⇔ pure ASCII,
#     where the dialects agree exactly) for sites whose POINT is real
#     upper/lower semantics — non-ASCII input costs one symmetric NULL,
#     envelope-style.
#   - ascii_fold_lower: translate('A-Z' → 'a-z'), identical on both
#     engines for EVERY input — for canonicalization sites (fingerprints,
#     synthesized keys) that must stay DEFINED on multilingual text;
#     non-ASCII chars pass through verbatim instead of case-folding.
_ASCII_UC = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LC = "abcdefghijklmnopqrstuvwxyz"


def ascii_only(col):
    """True iff the (non-NULL) string is pure ASCII — the domain where
    Java and utf8proc case mappings are identical byte-for-byte."""
    col = F.col(col) if isinstance(col, str) else col
    return F.octet_length(col) == F.length(col)


def ascii_only_sql(expr: str) -> str:
    # strlen, not octet_length: DuckDB's octet_length binds BLOB/BIT
    # only; strlen is its VARCHAR byte counter (Spark side uses
    # F.octet_length, which does take strings)
    return f"strlen({expr}) = length({expr})"


def ascii_fold_lower(col):
    """Case-fold ASCII letters only; every other char passes verbatim.
    Cross-engine deterministic for ALL inputs (unlike lower())."""
    col = F.col(col) if isinstance(col, str) else col
    return F.translate(col, _ASCII_UC, _ASCII_LC)


def ascii_fold_lower_sql(expr: str) -> str:
    return f"translate({expr}, '{_ASCII_UC}', '{_ASCII_LC}')"



@query(
    "q_str_funcs",
    # f-string oracle (ADVICE r10): the gate interpolates ascii_only_sql
    # so query and oracle derive from ONE definition — an edit to the
    # shared helper cannot desync this pair
    oracle=f"""
    SELECT c_custkey,
           -- ASCII gate (round-10 case-mapping probe): Java applies the
           -- FULL Unicode case mapping ('ß'->'SS', 'fi'-ligature->'FI',
           -- final sigma) while utf8proc applies the SIMPLE mapping —
           -- measured-divergent. On pure ASCII (octet_length = length)
           -- the mappings are identical; outside it both engines emit
           -- one symmetric NULL, envelope-style. Hostile customer rows
           -- 9404-9407 pin every class end-to-end.
           CASE WHEN {ascii_only_sql('c_name')}
                THEN upper(c_name) END AS up,
           CASE WHEN {ascii_only_sql('c_mktsegment')}
                THEN lower(c_mktsegment) END AS lo,
           substr(c_name, 10, 5) AS sub,
           CAST(length(c_name) AS BIGINT) AS len,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           -- \\z, not $ (round-9 regex-dialect probe): Java's $ matches
           -- before a final line terminator, RE2's is end-of-text only —
           -- a name ending in a newline extracted its digits on Spark
           -- and '' here; \\z agrees (hostile customer rows 9401-9403)
           regexp_extract(c_name, '([0-9]+)\\z', 1) AS numpart,
           replace(c_name, 'Customer#', 'C') AS replaced,
           -- trim(x, ' '), not trim(x) (round-10 probe): DuckDB's 1-arg
           -- trim strips Unicode Zs spaces (NBSP etc.), Spark's strips
           -- ASCII 0x20 only; the explicit char set matches Spark
           trim('  ' || c_mktsegment || ' ', ' ') AS trimmed
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (F1): upper/lower/substr/length/concat_ws/regexp/replace.

    Reference usages: strings.Split (vulcan/vulcan.go:128), prefix strip
    (vulcan.go:165-166), fmt.Sprintf ARN build (main.go:258).
    Round 10: up/lo gated to ASCII inputs — Java's full Unicode case
    mapping and utf8proc's simple mapping diverge on ß, ligatures, İ
    and final sigma (tests/test_case_edges.py); both engines NULL
    non-ASCII inputs symmetrically.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        # ASCII gate (round-10 case-mapping probe; see the oracle
        # comment): full-vs-simple Unicode case mapping diverges on
        # ß/ligatures/İ/final-sigma — agree exactly on pure ASCII
        F.when(ascii_only("c_name"), F.upper("c_name")).alias("up"),
        F.when(ascii_only("c_mktsegment"), F.lower("c_mktsegment")).alias("lo"),
        F.substring("c_name", 10, 5).alias("sub"),
        F.length("c_name").cast("long").alias("len"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nat"),
        # \z, not $ — Java/RE2 dialect split on terminator-ended names
        # (round-9 probe; see the oracle comment)
        F.regexp_extract("c_name", "([0-9]+)\\z", 1).alias("numpart"),
        F.expr("replace(c_name, 'Customer#', 'C')").alias("replaced"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS days_to_98,
           strftime(o_orderdate, '%Y-%m') AS ym,
           o_orderdate + INTERVAL 3 MONTH AS plus3m,
           CAST(isodow(o_orderdate) AS BIGINT) AS isodow
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (F2): extract/trunc/diff/format/interval arithmetic.

    Reference: RFC3339 parse/format (inventory/inventory.go:676-685),
    timestamp comparisons (main.go:338,354).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).cast("long").alias("days_to_98"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus3m"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("isodow"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / l_quantity, 9) AS unit_price,
           round(abs(l_discount - 0.05), 4) AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           l_orderkey % 7 AS key_mod,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(pow(l_discount, 2), 8) AS disc_sq
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math / cast family (F3): arithmetic, rounding, mod, sqrt, ln, pow.

    Reference: strconv.Atoi (vulcan/vulcan.go:174), page math
    (inventory/inventory.go:157-158).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 9 digits: quotients of 2-decimal money by small integers
        # either terminate well before digit 9 or sit ≥ 1/(2·q·10^9) away
        # from any rounding boundary, so both engines agree bit-for-bit
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 9).alias("unit_price"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_k_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount"), 2), 8).alias("disc_sq"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'other' END AS status_label,
           coalesce(nullif(o_orderpriority, '5-LOW'), 'LOW?') AS prio,
           o_totalprice > 200000 AS is_big,
           CASE WHEN o_totalprice IS NULL THEN -1.0
                ELSE round(o_totalprice, 2) END AS price_or_default
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family (F4): CASE/coalesce/nullif/boolean projection.

    Reference: create-vs-update branch (main.go:151-164), nil end_time
    handling (inventory/inventory.go:636-638).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_label"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("LOW?")).alias("prio"),
        (F.col("o_totalprice") > 200000).alias("is_big"),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
        .otherwise(F.round("o_totalprice", 2))
        .alias("price_or_default"),
    )


# ---- shared JSON pre-parse sanitization (rounds 7-8 probe fixes) -----
#
# The engines disagree about MALFORMED-ish payloads in two ways:
#   * raw control chars (RFC 8259 forbids them in strings): Spark's
#     Jackson leniently accepts a raw NUL, DuckDB's json_valid rejects
#     the payload (round 7) — so raw NULs are stripped before parsing;
#   * LONE surrogate escapes (round 8): a payload containing a high
#     surrogate escape with no low partner is ACCEPTED by Jackson
#     (extracts every other key fine) but json_valid=false in DuckDB's
#     yyjson — one hostile row flips a whole payload between the engines.
# The fix is a shared TEXTUAL transformation applied identically on both
# sides before any parse: delete lone surrogate escapes, keep valid
# pairs. Lookaround-free by construction (DuckDB's RE2 has no
# lookbehind): a single left-to-right alternation whose first branch
# matches a VALID pair and replaces it with itself (group 1), so the
# lone-surrogate branches can only consume what the pair branch didn't.
# Caveat (documented, parity-safe): the pattern cannot see an even
# number of preceding backslashes, so the literal text
# backslash-backslash-u-d-8-0-0 (an ESCAPED backslash, valid JSON) also
# loses its 'u d800' tail and turns invalid — on BOTH engines equally,
# which is the contract that matters here (one-bad-row discipline, not
# perfect JSON semantics).
_SURR_HI = r"\\u[dD][89abAB][0-9a-fA-F]{2}"
_SURR_LO = r"\\u[dD][c-fC-F][0-9a-fA-F]{2}"
_LONE_SURROGATE_RE = f"({_SURR_HI}{_SURR_LO})|{_SURR_HI}|{_SURR_LO}"



def json_sanitize(col):
    """Spark side: strip raw NULs, delete lone surrogate escapes."""
    return F.regexp_replace(F.translate(col, "\x00", ""), _LONE_SURROGATE_RE, "$1")


def json_sanitize_sql(expr: str) -> str:
    """DuckDB mirror of :func:`json_sanitize` (RE2 \\1 backreference)."""
    return (
        f"regexp_replace(replace({expr}, chr(0), ''), "
        f"'{_LONE_SURROGATE_RE}', '\\1', 'g')"
    )


# Round-9 JSON probe: Jackson (Spark) and yyjson (DuckDB) disagree on
# FOUR asymmetric payload classes, each a value divergence (not an
# error, so no ANSI gate catches it):
#   1. trailing garbage ('{"k":1} extra', '{"k":1}}') — Jackson parses
#      the first root value and ignores the rest; yyjson rejects.
#   2. nesting depth >= 1000 — Jackson's StreamReadConstraints kill the
#      payload (get_json_object -> NULL); yyjson parses any depth.
#   3. number tokens >= 1001 digits (same constraints, same split).
#      Key names > 50000 chars are the same class via maxNameLength.
#   4. bare NaN/Infinity literals — yyjson accepts them (json_valid is
#      TRUE and extraction yields 'NaN'); Jackson rejects the payload.
# (Duplicate keys are NOT a class: both engines take the FIRST value —
# pinned by hostile row 9304 and tests/test_json_edges.py.)
#
# No Spark-side strict-validity primitive exists (get_json_object,
# from_json, try_parse_json, json_object_keys are ALL lenient about
# trailing input — measured, see tests/test_json_edges.py), so the
# lockstep fix is a shared string-level PARSE ENVELOPE evaluated
# identically on both engines before parsing: a payload is treated as
# unparseable (NULL) unless it is <= 16384 chars, object-rooted with
# balanced braces/brackets, free of closer-joins (a '}' or ']' followed
# — after JSON whitespace — by anything other than ',', '}', ']' or
# end-of-text), has <= 256 opening braces+brackets (depth can never
# exceed opener count), no 1001+ run of number-token chars starting
# with a digit, and no bare NaN/Infinity token.
# Inside the envelope both parsers agree; outside it both sides NULL
# the row — one weird payload costs one NULL, never a divergence or
# the job. String values can false-positive the token regexes (a text
# field containing ': NaN', 'stuff] here', a quote-free 1001-digit
# string) — that gates a legit row SYMMETRICALLY, which parity
# tolerates by design.
# KNOWN RESIDUAL (documented, not representable at string level):
# comma-joined multi-roots ('{"a":1},{"b":2}') are indistinguishable
# from an array-of-objects INTERIOR ('[{"a":1},{"b":2}]'), so they
# stay Jackson-lenient/yyjson-strict; kept out of fixtures. (Non-comma
# joins — '{"k":1}x{"b":2}', '{"k":1}"x"' — ARE caught, by the
# closer-join guard; r10 ADVICE closed that gap.)
# Patterns use [{] / [}] character classes so the same text is valid
# in Java regex and RE2 without dialect-specific brace escaping.
#
# Round-10 ADVICE hardening (each confirmed-divergent before the fix):
#   a. JSON whitespace is the explicit class [ \t\r\n], never \s: the
#      dialects disagree on \s (Java includes \x0B, RE2 doesn't) and
#      BOTH include \f, which NEITHER parser accepts as JSON
#      whitespace — '{"k":1}'+VT/FF slid through the old \s end-guard
#      on Spark only (Jackson ignores trailing garbage) → '1' vs NULL.
#   b. End anchor is \z, not $: Java's $ matches BEFORE a final line
#      terminator (\n \r U+2028 U+2029 \x85), so '{"k":1}'+U+2028
#      passed the old end-guard on Spark only — measured '1' vs NULL.
#      (\z is absolute end-of-text in BOTH dialects — same fix as the
#      round-9 q_str_funcs anchor.)
#   c. The closer-join guard generalizes the old '}\s*{' seam guard:
#      '{"k":1}x{"b":2}' is balanced, object-rooted, ends '}' and has
#      no ws-adjacent '}{' seam, yet Jackson parses the first root
#      ('1') while yyjson rejects (NULL). After a '}' or ']' closer,
#      valid JSON allows only ',', '}', ']', whitespace or the end.
#   d. The number gate counts the whole TOKEN, not just a digit run:
#      Jackson's StreamReadConstraints reject integer tokens >= 1001
#      digits AND any FP/exp token >= 1002 total chars (all measured;
#      '<600 digits>.<600 digits>' = NULL on Spark, parsed by DuckDB).
#      A 1001+ run of [0-9.eE+-] starting with a digit covers both
#      classes; the cost is a symmetric NULL on legit 1001-char FP
#      tokens (both engines would parse those) — envelope-by-design.
_JSON_MAX_LEN = 16384
_JSON_MAX_OPENERS = 256
# JSON's whitespace exactly, identical in Java regex and RE2 (see a.)
_JSON_WS = r"[ \t\r\n]"
_JSON_START_RE = "^" + _JSON_WS + "*[{]"
_JSON_END_RE = "[}]" + _JSON_WS + "*" + r"\z"
# a closer followed (after JSON whitespace) by anything but , } ] or
# end-of-text — catches non-comma multi-root joins AND trailing
# non-JSON whitespace/terminators in one pass (see c.)
_JSON_CLOSER_JOIN_RE = r"[}\]]" + _JSON_WS + "*" + r"[^ \t\r\n,}\]]"
# a 1001+ run of number-token chars starting with a digit, written as
# digit+{1000} because RE2 rejects repetition counts above 1000 (see d.)
_JSON_NUMTOKEN_RE = "[0-9][0-9.eE+-]{1000}"
_JSON_NONSTD_RE = r"[:,\[]" + _JSON_WS + "*" + "[+-]?(NaN|Infinity)"


def _char_count(col, ch: str):
    return F.length(col) - F.length(F.translate(col, ch, ""))


def json_parseable(col):
    """Spark side: sanitized payload gated to the shared parse envelope
    (NULL outside it). Feed the RESULT to get_json_object."""
    s = json_sanitize(col)
    guard = (
        (F.length(s) <= _JSON_MAX_LEN)
        & s.rlike(_JSON_START_RE)
        & s.rlike(_JSON_END_RE)
        & (_char_count(s, "{") == _char_count(s, "}"))
        & (_char_count(s, "[") == _char_count(s, "]"))
        & ~s.rlike(_JSON_CLOSER_JOIN_RE)
        & ((_char_count(s, "{") + _char_count(s, "[")) <= _JSON_MAX_OPENERS)
        & ~s.rlike(_JSON_NUMTOKEN_RE)
        & ~s.rlike(_JSON_NONSTD_RE)
    )
    return F.when(guard, s)


def json_parseable_sql(expr: str) -> str:
    """DuckDB mirror of :func:`json_parseable` — identical envelope,
    identical regexes (RE2 accepts the same [{]-class patterns)."""
    s = json_sanitize_sql(expr)

    def cnt(ch: str) -> str:
        return f"(length({s}) - length(replace({s}, '{ch}', '')))"

    guard = " AND ".join(
        [
            f"length({s}) <= {_JSON_MAX_LEN}",
            f"regexp_matches({s}, '{_JSON_START_RE}')",
            f"regexp_matches({s}, '{_JSON_END_RE}')",
            f"{cnt('{')} = {cnt('}')}",
            f"{cnt('[')} = {cnt(']')}",
            f"NOT regexp_matches({s}, '{_JSON_CLOSER_JOIN_RE}')",
            f"{cnt('{')} + {cnt('[')} <= {_JSON_MAX_OPENERS}",
            f"NOT regexp_matches({s}, '{_JSON_NUMTOKEN_RE}')",
            f"NOT regexp_matches({s}, '{_JSON_NONSTD_RE}')",
        ]
    )
    return f"CASE WHEN {guard} THEN {s} END"


@query(
    "q_json_extract",
    oracle=f"""
    WITH g AS (
      -- shared parse envelope (round-9 JSON probe) on top of the shared
      -- pre-parse sanitization: NULLs the four Jackson/yyjson-asymmetric
      -- payload classes (trailing garbage, >=1000 nesting, >=1001-digit
      -- numbers / >50k names, bare NaN/Infinity) identically on both
      -- engines — see json_parseable_sql
      SELECT event_id, {json_parseable_sql('props')} AS p FROM events),
    j AS (
      -- json_valid guard mirrors get_json_object's NULL-on-malformed:
      -- DuckDB's json_extract_string RAISES on malformed JSON (one bad
      -- payload row kills the oracle), Spark quietly yields NULL.
      SELECT event_id,
             CASE WHEN json_valid(p)
                  THEN json_extract_string(p, '$.k')
             END AS ks,
             CASE WHEN json_valid(p)
                  THEN json_extract_string(p, '$.missing')
             END AS missing
      FROM g),
    -- integer-regex + TRY_CAST (round-7 JSON probe): a payload whose k is
    -- "abc" kills a bare ANSI CAST on Spark; 1.9 ROUNDS to 2 in DuckDB's
    -- cast but errors in Spark's; 99999999999999999999 parses as a double
    -- in DuckDB's JSON reader but stays raw text in Spark's — the regex
    -- admits only integer text (identical on both engines) and TRY_CAST
    -- turns the remaining overflow class into NULL on both
    -- \\z, not $ (round-9 regex-dialect probe): Java's $ matches BEFORE a
    -- final line terminator while RE2's $ is end-of-text only, and
    -- Spark's cast then TRIMS the terminator — so a payload k of
    -- "123\\n" yielded 123 on Spark and NULL here. \\z is the absolute
    -- end-of-text anchor in BOTH dialects (hostile rows 9325-9326).
    typed AS (
      SELECT event_id, missing,
             CASE WHEN regexp_matches(ks, '^-?[0-9]+\\z')
                  THEN TRY_CAST(ks AS BIGINT) END AS k
      FROM j)
    -- k2 gated to |k| < 2^62 (ADVICE r7): a valid-int64 payload k >= 2^62
    -- passes the regex and TRY_CAST, then the bare multiply errors under
    -- ANSI on Spark and out-of-ranges in DuckDB — identical fates, so
    -- parity held, but one hostile row killed the whole query. Explicit
    -- range compare (NOT abs(): abs(-2^63) itself overflows) mirrors the
    -- Spark branch exactly; out-of-range k keeps its value, only k2 nulls.
    SELECT event_id, k,
           CASE WHEN k > -4611686018427387904 AND k < 4611686018427387904
                THEN k * 2 END AS k2,
           missing
    FROM typed
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (F5): extract typed values from a JSON string column.

    Reference: json.Unmarshal of the event payload (vulcan/vulcan.go:105).
    get_json_object is a codegen'd path expression — no Python involved.
    Round 9: extraction reads through json_parseable (the shared parse
    envelope) — Jackson and yyjson give DIFFERENT ANSWERS, not errors,
    on trailing-garbage, deep-nesting, huge-number and NaN/Infinity
    payloads, so both engines now null those rows identically (hostile
    rows 9315-9324 pin every class; tests/test_json_edges.py pins the
    raw engine behaviors that force the envelope).
    """
    e = load_table(spark, sf_dir, "events")
    # shared pre-parse sanitization (NUL strip + lone-surrogate-escape
    # delete) PLUS the round-9 shared parse envelope — the four
    # Jackson/yyjson-asymmetric payload classes become NULL identically
    # on both engines before any parser runs; see json_parseable above
    props = json_parseable("props")
    ks = F.get_json_object(props, "$.k")
    # integer-regex + try_cast, mirrored in the oracle (see the oracle
    # comment): JSON values are UNTYPED text at extraction — a bare ANSI
    # cast dies on "abc" and diverges on "1.9" / out-of-range numbers.
    # \z, not $ (round-9 regex-dialect probe): Java's $ matches before a
    # final line terminator while RE2's is end-of-text only, and cast
    # trims the terminator — "123\n" was 123 here, NULL on the oracle
    k = F.when(ks.rlike("^-?[0-9]+\\z"), ks.try_cast("long"))
    # overflow-safe doubling (ADVICE r7): |k| < 2^62 gate, range compares
    # only (abs(-2^63) overflows under ANSI); mirrored in the oracle —
    # out-of-range k survives, only its double nulls
    lim = 4611686018427387904  # 2^62
    k2 = F.when((k > -lim) & (k < lim), k * 2)
    return e.select(
        "event_id",
        k.alias("k"),
        k2.alias("k2"),
        F.get_json_object(props, "$.missing").alias("missing"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           -- the CASE mirrors Spark's NULL-STRICT aggregate fold: one NULL
           -- component makes the whole norm NULL there, while DuckDB's
           -- list_sum would silently SKIP the NULL and return a partial norm.
           -- The coalesce mirrors the fold's 0.0 INIT value on an EMPTY
           -- array (round-8 probe): Spark's aggregate over [] returns the
           -- init (norm 0.0) while DuckDB's list_sum([]) is NULL
           CASE WHEN len(list_filter(embedding, x -> x IS NULL)) = 0
                THEN round(sqrt(coalesce(list_sum(
                       list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                       0.0)), 6)
           END AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_component
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (F6): size / index / higher-order transform+aggregate.

    Reference: annotation-array iteration (main.go:131-138). The L2 norm is
    a higher-order `aggregate` fold — fully JVM-side, the pattern reused by
    the cosine-similarity operator.

    try_element_at, not element_at (round-8 probe): under ANSI a bare
    element_at on an EMPTY array kills the whole query with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT, while DuckDB's embedding[1]
    returns NULL — one zero-length vector (a decoder bug, a truncated
    write) must cost one NULL, not the job. The other element_at sites in
    the package are safe by construction, each for a concrete structural
    reason (NOT by conjunct evaluation order, which the optimizer may
    reorder — ADVICE r8): split() always yields at least one element, so
    element_at(parts, 1) on a split result cannot see an empty array
    (operators/filters.py, plans/temporal.py key split); indices are
    generated from the array's own size, so every access is in range
    (llm/bpe.py pair enumeration, llm/dedup.py + llm/curation.py +
    llm/text.py shingle windows); or a SEPARATE preceding .where stage
    has already dropped short arrays (operators/filters.py:138). Map-key
    element_at sites construct the map with those literal keys present
    (q_map_funcs). Any new site without such a structural guarantee
    should use try_element_at.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.try_element_at("embedding", F.lit(1)).cast("double"), 6).alias(
            "first_component"
        ),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("embedding"),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            6,
        ).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_component"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           event_type AS mtype,
           CAST(user_id AS VARCHAR) AS muid,
           CAST(2 AS BIGINT) AS n_keys,
           'type,uid' AS keys_joined
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (F7): build a map, extract, enumerate keys.

    Reference: metadata headers folded into a map then read by key
    (vulcan/vulcan.go:137-149). The oracle computes the same *values*
    directly — the comparison contract is on the result, not the plan.
    """
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return e.withColumn("m", m).select(
        "event_id",
        F.element_at("m", "type").alias("mtype"),
        F.element_at("m", "uid").alias("muid"),
        F.size(F.map_keys("m")).cast("long").alias("n_keys"),
        F.array_join(F.map_keys("m"), ",").alias("keys_joined"),
    )

def md5_prefix_long(col) -> "Column":
    """First 8 hex chars of md5 as a BIGINT — THE cross-engine hash
    bridge: Spark ``conv(substring(md5(x),1,8),16,10)`` equals DuckDB
    ``CAST('0x' || substr(md5(x),1,8) AS BIGINT)`` (32 hex bits fit a
    BIGINT, so no sign/overflow divergence). One definition shared by the
    hashed classifier (llm/quality.py), feature hashing (llm/features.py)
    and the count-min sketch (operators/sketches.py) — widening or
    changing this in one place used to silently break only the modules
    left behind, invisible until the driver rotation re-checked them.
    Every oracle that consumes it must use the DuckDB twin verbatim."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
