"""Unicode text canonicalization (SURVEY.md §2.16): NFC normalization and
accent stripping as Arrow-batched kernels.

Every multilingual corpus pipeline canonicalizes before hashing — exact
dedup (llm/dedup.py) keys on byte digests, so "café" composed and "café"
decomposed are different documents until NFC folds them. Spark has no
built-in Unicode normalizer, so this is one of the few legitimate
Python-kernel spots (same policy tier as the tokenizer-adjacent ops):
a ``pandas_udf`` — Arrow batch in, Arrow batch out — applying
``unicodedata.normalize``; never a row-at-a-time Python UDF.

Scale shape: map-only (zero shuffles); the UDF cost is one Arrow
round-trip over the text column, and the output carries fixed-width md5
digests so downstream comparisons never reship the corpus.

Oracle: DuckDB ships ``nfc_normalize`` and ``strip_accents`` natively;
Python's NFD-drop-Mn equals DuckDB's strip_accents on the injected
repertoire (verified for é/ü/ñ/Å — both are ICU-compatible foldings).
The shipped synthetic corpus is pure ASCII — NFC of it is the identity,
which would green-light a broken kernel (the round-2 vacuity lesson) —
so both sides first append a deterministic doc_id-keyed suffix mixing
decomposed and precomposed accents, making the normalizer provably do
work on 3/4 of the rows.

Reference parity: no text surface in the reference (stream ETL only);
extends the X4 text-analysis family.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from graph_vulcan_assets_spark.registry import query
from graph_vulcan_assets_spark.tables import load_table

# doc_id % 4 selects the suffix; index 3 is "unchanged" so the identity
# path stays covered too. 0/1 are DECOMPOSED (NFD) spellings — NFC must
# recompose them; 2 is precomposed — NFC is the identity on it but
# strip_accents still fires.
_SUFFIXES = (
    " cafe\u0301",  # cafe + combining acute U+0301 (NFD spelling)
    " u\u0308ber",  # u + combining diaeresis U+0308 (NFD spelling)
    " ni\u00f1o",  # nino precomposed U+00F1 (NFC already)
    "",
)


def _mutated(text: Column, doc_id: Column) -> Column:
    """text ⊕ deterministic accent suffix — identical expression both engines.

    NULs are stripped FIRST (standard control-char sanitization before
    Unicode normalization; tokenizers do the same): DuckDB's utf8proc-
    backed nfc_normalize/strip_accents treat the string as NUL-TERMINATED
    — nothing after an embedded chr(0) gets normalized — while Python's
    unicodedata normalizes the whole string, so without the shared
    sanitization the two engines literally cannot agree on a NUL-bearing
    document (round-7 extreme-string probe)."""
    m = doc_id % len(_SUFFIXES)
    out = F.translate(text, "\x00", "")
    base = out
    for i, suf in enumerate(_SUFFIXES[:-1]):
        out = F.when(m == i, F.concat(base, F.lit(suf))).otherwise(out)
    return out


def _mutated_sql(text: str = "text", doc_id: str = "doc_id") -> str:
    clean = f"replace({text}, chr(0), '')"
    arms = "".join(
        f" WHEN {doc_id} % {len(_SUFFIXES)} = {i} THEN {clean} || '{suf}'"
        for i, suf in enumerate(_SUFFIXES[:-1])
    )
    return f"CASE{arms} ELSE {clean} END"


@pandas_udf(StringType())
def nfc_normalize(s: pd.Series) -> pd.Series:
    """NFC normalization, Arrow-batched. Null-preserving."""
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


@pandas_udf(StringType())
def strip_accents(s: pd.Series) -> pd.Series:
    """Accent folding: NFD then drop combining marks (category Mn)."""

    def fold(x: str | None) -> str | None:
        if x is None:
            return None
        return "".join(
            c
            for c in unicodedata.normalize("NFD", x)
            if unicodedata.category(c) != "Mn"
        )

    return s.map(fold)


@query(
    "q_text_normalize",
    oracle=f"""
    WITH mutated AS (
      SELECT doc_id, {_mutated_sql()} AS raw FROM documents
    )
    SELECT doc_id,
           md5(nfc_normalize(raw)) AS nfc_md5,
           md5(strip_accents(raw)) AS folded_md5,
           (nfc_normalize(raw) != raw) AS nfc_changed
    FROM mutated
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (X4 extension): NFC + accent folding.

    md5 digests (not the normalized text) are the output, proving
    byte-identical normalization across engines while keeping result
    rows fixed-width — the same trick as q_pii_redact.
    """
    d = load_table(spark, sf_dir, "documents")
    raw = _mutated(F.col("text"), F.col("doc_id"))
    nfc = nfc_normalize(raw)
    return d.select(
        "doc_id",
        F.md5(nfc).alias("nfc_md5"),
        F.md5(strip_accents(raw)).alias("folded_md5"),
        (nfc != raw).alias("nfc_changed"),
    )
