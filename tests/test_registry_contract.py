"""Registry / driver-contract invariants.

The driver checks the FIRST 50 queries in iteration order against their
oracles — these tests pin the properties that make that budget count:
every exposed query is callable, every first-50 entry carries an oracle,
and the round-13 rotation (the 5-key churn head — every oracle-bearing
query this optimization round restructured: fused Lloyd/PQ updates,
driver-LUT ADC, chunked SemDeDup Gram, collect-driven BPE — then the
oracle-bearing inventory oldest-evidence-first: all 38 remaining r9-era
keys and the oldest r10-era keys) stays at the front until the next
deliberate rotation.
"""

from __future__ import annotations

import glob
import json
import os
import re

from graph_vulcan_assets_spark.registry import (
    PRIORITY,
    ROTATION_EVIDENCE_THROUGH,
    all_oracle_sql,
    all_queries,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_names_are_registered():
    qs = all_queries()
    missing = [n for n in PRIORITY if n not in qs]
    assert not missing, f"PRIORITY references unregistered queries: {missing}"


def test_first_50_all_have_oracles():
    """A rows-only query inside the driver's budget wastes a correctness
    slot — the head of the iteration order must be fully oracle-backed."""
    first50 = list(all_queries().keys())[:50]
    oracles = all_oracle_sql()
    bare = [n for n in first50 if n not in oracles]
    assert not bare, f"first-50 queries without oracles: {bare}"


def _last_green_round() -> dict[str, int]:
    """Latest driver-green round per key, from the CORRECTNESS_r*.json
    files the CURRENT rotation was computed from (rounds <=
    ROTATION_EVIDENCE_THROUGH). Files from later rounds are deliberately
    excluded: the driver writes CORRECTNESS_r{N}.json before the round-
    {N+1} rotation exists, and judging the old PRIORITY against evidence
    it could not have seen would red the suite in exactly that window
    (round 9: this replaced a hardcoded round list whose one-round lag
    provided the same exclusion by accident)."""
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m and int(m.group(1)) <= ROTATION_EVIDENCE_THROUGH:
            rounds.append((int(m.group(1)), path))
    last: dict[str, int] = {}
    for r, path in sorted(rounds):
        for k, v in json.load(open(path)).items():
            if v.get("hash_match"):
                last[k] = r
    return last


# Keys whose implementing code changed AFTER their latest driver row.
# Round-13 churn (optimization round 2): every oracle-bearing query whose
# Spark-side plan was restructured for performance — the fused map-only
# Lloyd/PQ updates + lazy quantize checkpoint (kmeans/PQ), the
# driver-built literal-LUT ADC scorer, the chunked-Gram SemDeDup kernel,
# and the collect-driven BPE train (q_bpe_pairs shares pair_counts).
# Results were proven identical against the unchanged oracles
# (check_subset + full driver_sim + probe_extreme) before commit;
# conservative churn ranking applies anyway.
_CHURN: set[str] = {
    "q_kmeans_assign",
    "q_pq_codes",
    "q_pq_adc_topk",
    "q_dedup_semantic",
    "q_bpe_pairs",
}



def test_rotation_spends_budget_on_spill_then_staleness():
    """Round-6 contract (VERDICT r5 #1): oracle coverage closed at 174/174
    in r5, so the budget is pure staleness rotation by the standing
    (module-changed-since-last-driver-row, evidence-age) rule — the
    recorded r1-era spill first, then the churn keys whose latest driver
    row predates their current code, then the oldest unchanged evidence.
    No fresh-evidence key may squat on a budget slot."""
    last = _last_green_round()
    names = list(all_queries().keys())
    first50 = names[:50]

    # every r1-era-evidence key must sit inside the budget — or, when
    # churn saturates all 50 slots (changed code outranks old evidence
    # under the standing rule), ahead of every FRESH-evidence unchanged
    # key in the recorded spill so it cannot drift
    r1_era = {n for n, r in last.items() if r == 1}
    # default=len(names): if churn/old-evidence keys fill the whole order,
    # there is no fresh-evidence boundary and the containment checks below
    # degrade gracefully instead of erroring with StopIteration (ADVICE r6)
    first_fresh = next(
        (i for i, n in enumerate(names) if n not in _CHURN and last.get(n, 0) > 2),
        len(names),
    )
    misplaced = [n for n in r1_era if n not in names[:first_fresh]]
    assert not misplaced, (
        f"r1-era keys (oldest driver evidence) ranked behind fresh-evidence "
        f"unchanged keys: {misplaced}"
    )

    # every budget slot must be justified: code changed since the last
    # driver row, the evidence is r1/r2-era (the oldest in the registry),
    # or — when churn + r1/r2 keys leave spare slots — the key heads the
    # OLDEST-evidence tail (evidence-age rotation fills the remainder; a
    # key may not sit in the budget while an older-evidence unchanged key
    # waits outside it)
    unjustified = [n for n in first50 if n not in _CHURN and last.get(n, 0) > 2]
    for n in unjustified:
        older_outside = [
            m
            for m in names[50:]
            if m not in _CHURN and last.get(m, 0) and last[m] < last.get(n, 0)
        ]
        assert not older_outside, (
            f"{n} (evidence r{last.get(n)}) squats on a budget slot while "
            f"older-evidence keys wait outside: {older_outside[:5]}"
        )


def test_oracle_outputs_are_driver_hashable(spark, sf_dir):
    """No oracle-bearing query may return a top-level Array/Map/Struct
    column (VERDICT r3 #3). The driver canonicalizes results with pandas
    ``sort_values`` before hashing, which raises ``TypeError: unhashable
    type`` on list-valued columns — exactly how q_embed_centroid shipped
    red in round 3 while the list-normalizing local parity suite stayed
    green. Only schemas are asserted; note that CONSTRUCTING some
    iterative queries (kmeans/PQ/BPE/graph) runs their eager training
    jobs at the test SF, so this sweep costs about a minute, not zero."""
    from pyspark.sql import types as T

    oracles = all_oracle_sql()
    qs = all_queries()
    offenders = []
    decimal_offenders = []
    for name in oracles:
        schema = qs[name](spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders.append((name, bad))
        dec = [f.name for f in schema.fields if isinstance(f.dataType, T.DecimalType)]
        if dec:
            decimal_offenders.append((name, dec))
    assert not offenders, (
        "oracle-bearing queries with driver-unhashable top-level columns "
        f"(pandas sort_values cannot hash them): {offenders}"
    )
    # No query may EMIT a decimal column (round 7, VERDICT r6 #1): the
    # driver's hasher is representation-sensitive — q_source_csv went red
    # in round 6 with bit-identical values because Spark yielded Decimal
    # where DuckDB yielded int. 128-bit intermediates are fine; reduce to
    # BIGINT (sign-safe residue) or a string digest before emitting.
    assert not decimal_offenders, (
        f"queries emitting decimal columns (driver-hash hostile): {decimal_offenders}"
    )


def test_every_query_key_is_unique_and_wellformed():
    qs = all_queries()
    assert len(qs) == len(set(qs))  # dict, but guards accidental re-keying
    bad = [n for n in qs if not n.startswith("q_") or " " in n]
    assert not bad, f"malformed query keys: {bad}"
