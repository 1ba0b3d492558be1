"""Unicode canonicalization kernels (llm/normalize.py).

Oracle parity runs in tests/test_oracle_parity.py; these pin the kernel
semantics the md5 compare wouldn't localize.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.normalize import (
    _SUFFIXES,
    nfc_normalize,
    q_text_normalize,
    strip_accents,
)


def test_suffix_repertoire_is_what_the_docstring_claims():
    assert not unicodedata.is_normalized("NFC", _SUFFIXES[0])  # decomposed
    assert not unicodedata.is_normalized("NFC", _SUFFIXES[1])  # decomposed
    assert unicodedata.is_normalized("NFC", _SUFFIXES[2])  # precomposed
    assert _SUFFIXES[3] == ""


def test_nfc_recomposes_and_preserves_nulls(spark):
    df = spark.createDataFrame(
        [("café",), ("plain ascii",), (None,)], ["s"]
    )
    out = {r["s"]: r["n"] for r in df.select("s", nfc_normalize("s").alias("n")).collect()}
    assert out["café"] == "café"
    assert out["plain ascii"] == "plain ascii"
    assert out[None] is None


def test_strip_accents_folds_both_spellings(spark):
    df = spark.createDataFrame(
        [("café",), ("café",), ("niño",), (None,)], ["s"]
    )
    out = [r["f"] for r in df.select(strip_accents("s").alias("f")).collect()]
    assert out[:3] == ["cafe", "cafe", "nino"]
    assert out[3] is None


def test_nfc_changed_tracks_mutation_arm(spark, sf_dir):
    """Arms 0/1 are decomposed (NFC does work); arms 2/3 are already NFC."""
    res = q_text_normalize(spark, sf_dir).withColumn(
        "arm", F.col("doc_id") % 4
    )
    agg = {
        (r["arm"], r["nfc_changed"]): r["n"]
        for r in res.groupBy("arm", "nfc_changed").agg(F.count("*").alias("n")).collect()
    }
    for arm in (0, 1):
        assert (arm, True) in agg and (arm, False) not in agg
    for arm in (2, 3):
        assert (arm, False) in agg and (arm, True) not in agg
