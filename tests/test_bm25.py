"""BM25 ranked retrieval (llm/text.py::q_text_bm25).

Oracle parity runs in tests/test_oracle_parity.py; this recomputes the
whole scoring path in plain Python as an engine-independent ground truth.
"""

from __future__ import annotations

import math

from graph_vulcan_assets_spark.llm.text import _BM25_TERMS, q_text_bm25
from graph_vulcan_assets_spark.tables import load_table


def test_bm25_matches_python_recompute(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    df = {
        term: sum(1 for toks in docs.values() if term in toks)
        for term in _BM25_TERMS
    }
    expected = {}
    for doc_id, toks in docs.items():
        dl = len(toks)
        total = 0
        n_terms = 0
        for term in _BM25_TERMS:
            tf = toks.count(term)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            s = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)))
            # HALF_UP like Spark's round(); scores are positive so
            # floor(x + 0.5) is exactly that (Python round() is banker's)
            total += int(math.floor(s * 1000000.0 + 0.5))
            n_terms += 1
        if n_terms:
            expected[doc_id] = (total, n_terms)

    got = {
        r["doc_id"]: (r["bm25_micros"], r["n_terms"])
        for r in q_text_bm25(spark, sf_dir).collect()
    }
    assert len(got) > 0
    assert got == expected
