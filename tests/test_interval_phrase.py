"""Crafted-data tests for interval_overlap_join and phrase_search."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from graph_vulcan_assets_spark.llm.text import phrase_search
from graph_vulcan_assets_spark.operators.joins import interval_overlap_join

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _t(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def _iv(spark, rows):
    return spark.createDataFrame(rows, "id long, start timestamp, end timestamp")


def test_interval_join_exact_pairs_and_overlap(spark):
    left = _iv(
        spark,
        [
            (1, _t(0), _t(90)),    # spans 2 chunks; overlaps w10 and w11
            (2, _t(200), _t(210)), # inside one chunk; overlaps w12
            (3, _t(500), _t(510)), # overlaps nothing
        ],
    )
    right = _iv(
        spark,
        [
            (10, _t(30), _t(60)),
            (11, _t(60), _t(120)),  # [start,end): touches left-1 at t60..t90
            (12, _t(180), _t(240)),
            (13, _t(90), _t(95)),   # starts exactly at left-1's end: NO overlap
        ],
    )
    got = {
        (r.l_id, r.r_id): r.overlap_us
        for r in interval_overlap_join(left, right, chunk_seconds=3600).collect()
    }
    m = 60 * 1_000_000
    assert got == {(1, 10): 30 * m, (1, 11): 30 * m, (2, 12): 10 * m}


def test_interval_join_pair_spanning_many_chunks_emitted_once(spark):
    left = _iv(spark, [(1, _t(0), _t(600))])      # 10 hours
    right = _iv(spark, [(2, _t(30), _t(570))])    # 9 hours inside it
    rows = interval_overlap_join(left, right, chunk_seconds=3600).collect()
    assert len(rows) == 1
    assert rows[0].overlap_us == 540 * 60 * 1_000_000


def test_interval_join_degenerate_intervals_emit_nothing(spark):
    """ADVICE r3: end <= start is empty under [start, end) — F.sequence
    with start > stop would generate a DESCENDING chunk run and emit
    spurious overlap_us=0 pairs; degenerate intervals must vanish."""
    left = _iv(
        spark,
        [
            (1, _t(60), _t(60)),   # empty: end == start
            (2, _t(120), _t(0)),   # inverted: end < start (spans chunks 0-2 reversed)
            (3, _t(0), _t(30)),    # real interval, sanity anchor
        ],
    )
    right = _iv(
        spark,
        [
            (10, _t(0), _t(180)),  # covers everything that exists
            (11, _t(120), _t(120)),  # degenerate on the right side too
        ],
    )
    got = {
        (r.l_id, r.r_id): r.overlap_us
        for r in interval_overlap_join(left, right, chunk_seconds=3600).collect()
    }
    assert got == {(3, 10): 30 * 60 * 1_000_000}


def test_interval_join_no_nested_loop(spark):
    from graph_vulcan_assets_spark.plans.lint import plan_text

    left = _iv(spark, [(1, _t(0), _t(90))])
    right = _iv(spark, [(2, _t(30), _t(60))])
    p = plan_text(interval_overlap_join(left, right))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_search_three_terms_and_repeats(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c x a b c"),     # phrase "a b c" twice
            (2, "a b x b c"),         # terms present but never adjacent in order
            (3, "c b a"),             # reversed: no match
            (4, "a a b c"),           # one match at pos 1
        ],
    )
    got = {r.doc_id: r.n_occurrences for r in phrase_search(docs, ["a", "b", "c"]).collect()}
    assert got == {1: 2, 4: 1}


def test_phrase_search_overlapping_bigram(spark):
    docs = _docs(spark, [(1, "go go go go")])
    got = {r.doc_id: r.n_occurrences for r in phrase_search(docs, ["go", "go"]).collect()}
    # postings adjacency counts every consecutive pair, including overlaps
    assert got == {1: 3}
