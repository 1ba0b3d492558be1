"""Feature hashing + topic assignment (llm/features.py)."""

from __future__ import annotations

import hashlib

from graph_vulcan_assets_spark.llm.features import (
    N_DIMS,
    N_TOPICS,
    _WMOD,
    _WSHIFT,
    assign_topics,
    hashed_features,
    topic_codebook,
)


def _dim(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % N_DIMS


def _w(topic: int, dim: int) -> int:
    return (
        int(hashlib.md5(f"{topic}:{dim}".encode()).hexdigest()[:8], 16) % _WMOD
        - _WSHIFT
    )


def _ref_assign(text: str) -> tuple[int, int]:
    feats: dict[int, int] = {}
    for t in text.split(" "):
        if t:
            feats[_dim(t)] = feats.get(_dim(t), 0) + 1
    best = None
    for topic in range(N_TOPICS):
        d2 = sum(
            (feats.get(dim, 0) - _w(topic, dim)) ** 2 for dim in range(N_DIMS)
        )
        if best is None or (d2, topic) < best:
            best = (d2, topic)
    return best[1], best[0]


def test_sparse_scoring_equals_dense_reference(spark):
    texts = [
        "merge sort scan filter merge",
        "a b c d e f g h i j k",
        "spark spark spark",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.topic, r.dist2)
        for r in assign_topics(hashed_features(docs), topic_codebook(spark)).collect()
    }
    for i, t in enumerate(texts):
        if not t:
            continue  # empty doc has no features -> no assignment row
        topic, d2 = _ref_assign(t)
        assert got[i] == (topic, d2), (i, t)
    assert 3 not in got


def test_codebook_is_constant_size(spark):
    cb = topic_codebook(spark)
    assert cb.count() == N_TOPICS * N_DIMS
