"""BPE training/encoding (llm/bpe.py) vs a pure-Python reference.

The reference implements classic Sennrich-style BPE directly on a dict —
count adjacent pairs weighted by word frequency, argmax with the same
(count desc, left asc, right asc) tie-break, greedy left-to-right merge —
and must agree with the distributed version merge-for-merge and
token-for-token.
"""

from __future__ import annotations

from collections import Counter

import pytest

from graph_vulcan_assets_spark.llm.bpe import (
    bpe_encode_words,
    bpe_train,
    pair_counts,
    word_counts,
)


def ref_bpe(word_freq: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += word_freq[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower widest"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _word_freq():
    wf: Counter = Counter()
    for _, text in CORPUS:
        wf.update(text.split(" "))
    return dict(wf)


def test_pair_counts_match_reference(spark, docs):
    from pyspark.sql import functions as F

    vocab = word_counts(docs).withColumn("syms", F.split("w", ""))
    got = {(r.a, r.b): r.cnt for r in pair_counts(vocab).collect()}
    pc: Counter = Counter()
    for w, f in _word_freq().items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += f
    assert got == dict(pc)


def test_merges_match_reference(spark, docs):
    n = 8
    merges_df, _ = bpe_train(docs, n)
    got = [(r.left, r.right, r.cnt) for r in merges_df.orderBy("rank").collect()]
    want, _ = ref_bpe(_word_freq(), n)
    assert got == want


def test_final_vocab_matches_reference(spark, docs):
    n = 8
    _, vocab = bpe_train(docs, n)
    got = {r.w: list(r.syms) for r in vocab.collect()}
    _, want = ref_bpe(_word_freq(), n)
    assert got == want


def test_encode_words_applies_artifact(spark, docs):
    from pyspark.sql import functions as F

    n = 6
    merges_df, trained_vocab = bpe_train(docs, n)
    artifact = [(r.left, r.right) for r in merges_df.orderBy("rank").collect()]
    fresh = word_counts(docs).withColumn("syms", F.split("w", ""))
    re_encoded = {r.w: list(r.syms) for r in bpe_encode_words(fresh, artifact).collect()}
    assert re_encoded == {r.w: list(r.syms) for r in trained_vocab.collect()}


def test_registered_queries_nonvacuous(spark, sf_dir):
    from graph_vulcan_assets_spark.registry import all_queries

    q = all_queries()
    merges = q["q_bpe_merges"](spark, sf_dir)
    assert merges.count() == 12
    enc = q["q_bpe_encode"](spark, sf_dir).limit(5).collect()
    assert len(enc) == 5
    # BPE must compress: learned tokens strictly fewer than characters.
    assert all(r.n_tokens_bpe < r.n_tokens_char for r in enc)
