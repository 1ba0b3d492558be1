"""SemDeDup semantic dedup (llm/semdedup.py).

Oracle parity runs in tests/test_oracle_parity.py; these pin that the
full cluster → pair → threshold path finds exactly the injected twins on
the pairwise-random synthetic corpus, and that the flagged pairs really
clear the cosine bar.
"""

from __future__ import annotations

import math

import pytest

from graph_vulcan_assets_spark.llm.semdedup import (
    _TAU_SQ,
    _TWIN_EVERY,
    _TWIN_OFFSET,
    q_dedup_semantic,
)
from graph_vulcan_assets_spark.tables import load_table


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    return q_dedup_semantic(spark, sf_dir).collect()


def test_finds_exactly_the_injected_twins(spark, sf_dir, result):
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    expected_twins = {
        vid + _TWIN_OFFSET for vid in range(0, n_vecs, _TWIN_EVERY)
    }
    assert {r["vec_id"] for r in result} == expected_twins
    for r in result:
        # lowest-id-wins: the keeper is the original the twin was made from
        assert r["dup_of"] == r["vec_id"] - _TWIN_OFFSET


def test_flagged_pairs_clear_the_cosine_bar(spark, sf_dir, result):
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    tau = math.sqrt(_TAU_SQ)
    for r in result:
        a = [round(float(x) * 1e6) for x in emb[r["dup_of"]]]
        # reconstruct the injected twin exactly as both engines build it
        b = [q + (pos % 3 - 1) for pos, q in enumerate(a)]
        dot = sum(x * y for x, y in zip(a, b))
        cos = dot / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))
        assert cos >= tau
