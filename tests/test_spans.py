"""Exact-substring span dedup (llm/spans.py) on crafted corpora.

The synthetic documents table only exercises full-doc spans (its only
cross-doc duplication is exact-duplicate documents), so these tests craft
partial overlaps: a shared passage embedded mid-document, adjacent gram
starts merging into one island, and the owner-keeps-copy rule.
"""

from __future__ import annotations

import pytest

from graph_vulcan_assets_spark.llm.spans import (
    SPAN_K,
    duplicated_spans,
    excise_foreign_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def _tok(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


SHARED = " ".join(f"s{i}" for i in range(10))  # 10-token shared passage


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1: passage mid-document; doc 2: same passage at the start;
    # doc 3: no duplication; doc 4: exact copy of doc 3's text? no —
    # doc 4 shares nothing. Unique fillers keep every other gram unshared.
    return _docs(
        spark,
        [
            (1, _tok("a", 5) + " " + SHARED + " " + _tok("b", 5), "en", "web"),
            (2, SHARED + " " + _tok("c", 7), "en", "web"),
            (3, _tok("d", 20), "en", "web"),
            (4, _tok("e", 3), "en", "web"),  # shorter than k: no grams at all
        ],
    )


def test_partial_span_detected_and_maximal(spark, corpus):
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in duplicated_spans(corpus, SPAN_K).collect()
    }
    # doc 1: shared tokens occupy positions 5..14 -> gram starts 5,6,7,
    # one island -> span 5..14, len 10. doc 2: positions 0..9.
    assert spans == {(1, 5, 14, 10), (2, 0, 9, 10)}


def test_owner_keeps_copy_foreign_excised(spark, corpus):
    out = {r.doc_id: r.text_clean for r in excise_foreign_spans(corpus, SPAN_K).collect()}
    assert len(out) == 4
    # doc 1 is the owner (lowest doc_id): untouched.
    assert out[1] == _tok("a", 5) + " " + SHARED + " " + _tok("b", 5)
    # doc 2 loses the shared passage, keeps its unique tail.
    assert out[2] == _tok("c", 7)
    # untouched docs round-trip exactly.
    assert out[3] == _tok("d", 20)
    assert out[4] == _tok("e", 3)


def test_exact_dup_doc_becomes_empty(spark):
    text = _tok("x", 12)
    corpus = _docs(spark, [(10, text, "en", "web"), (11, text, "en", "web")])
    out = {r.doc_id: r.text_clean for r in excise_foreign_spans(corpus, SPAN_K).collect()}
    assert out == {10: text, 11: ""}


def test_two_separate_islands_in_one_doc(spark):
    p1 = " ".join(f"p{i}" for i in range(8))
    p2 = " ".join(f"q{i}" for i in range(8))
    corpus = _docs(
        spark,
        [
            (1, p1 + " " + _tok("u", 6) + " " + p2, "en", "web"),
            (2, p1 + " " + _tok("v", 9), "en", "web"),
            (3, _tok("w", 9) + " " + p2, "en", "web"),
        ],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(corpus, SPAN_K).collect()
    }
    # doc 1 has TWO distinct islands (positions 0..7 and 14..21), shared
    # with different partners; islands must not merge across the gap.
    assert spans == {(1, 0, 7), (1, 14, 21), (2, 0, 7), (3, 9, 16)}


def test_nonvacuous_on_testdata(spark, sf_dir):
    from graph_vulcan_assets_spark.registry import all_queries

    n = all_queries()["q_dedup_spans"](spark, sf_dir).count()
    assert n > 0


@pytest.mark.slow
def test_hot_gram_skew_within_2x_of_uniform(spark):
    """Hot-gram skew rehearsal (VERDICT r11 #8): a boilerplate gram
    present in half the corpus concentrates one window-partition key
    (round 12 moved the dup test to a min/max window over the gram hash),
    but the skewed partition's work is linear in its row count — so
    wall-time at equal volume must stay within ~2x of a uniform corpus.
    Mirrors tests/test_skew_replay.py's co-measured-control protocol."""
    import time

    from pyspark.sql import Row

    def corpus(hot: bool, n_docs: int = 400, toks: int = 40):
        boiler = " ".join(f"b{j}" for j in range(SPAN_K + 4))
        rows = []
        for i in range(n_docs):
            body = " ".join(f"t{i}x{j}" for j in range(toks))
            if hot and i % 2 == 0:
                body = boiler + " " + body
            rows.append(Row(doc_id=i, text=body, lang="en", source="web"))
        return spark.createDataFrame(rows)

    def seconds(df, runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            duplicated_spans(df, SPAN_K).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    uniform, skewed = corpus(False), corpus(True)
    seconds(uniform, runs=1)  # codegen warm-up outside the timing
    for _attempt in range(2):
        t_uniform = seconds(uniform)
        t_skewed = seconds(skewed)
        if t_skewed <= 2.0 * max(t_uniform, 0.5):
            return
    # wall-clock ratios flake on loaded co-tenant hosts (ADVICE r12 — the
    # same noise class bench.py's load gate addresses): only adjudicate a
    # quiet host; a hot one gets a skip that names the contamination
    import os

    load = os.getloadavg()[0]
    if load > 8.0:
        pytest.skip(
            f"host loadavg {load:.1f} — skew ratio not adjudicable "
            f"(skewed {t_skewed:.2f}s vs uniform {t_uniform:.2f}s)"
        )
    pytest.fail(
        f"hot-gram spans {t_skewed:.2f}s vs uniform {t_uniform:.2f}s on "
        "both attempts — the shared gram is serializing the dup window"
    )
