"""Registry / driver-contract invariants.

The driver checks the FIRST 50 queries in iteration order against their
oracles — these tests pin the properties that make that budget count:
every exposed query is callable, every first-50 entry carries an oracle,
and the round-5 rotation (16-key recorded spill + 34 r2-era staleness
re-greens) stays at the front until the next deliberate rotation.
"""

from __future__ import annotations

import json
import os

from graph_vulcan_assets_spark.registry import PRIORITY, all_oracle_sql, all_queries

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
    last: dict[str, int] = {}
    for r in (1, 2, 3, 4):
        path = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            for k, v in json.load(open(path)).items():
                if v.get("hash_match"):
                    last[k] = r
    return last


def test_rotation_spends_budget_on_spill_then_staleness():
    """Round-5 contract (VERDICT r4 #1/#2): positions 1-16 are the round-4
    recorded spill (never driver-checked — green rows close oracle coverage
    at 174/174), and positions 17-50 are all re-greens of keys whose latest
    driver row is r2 (the stalest evidence behind round-4-touched modules)."""
    last = _last_green_round()
    first50 = list(all_queries().keys())[:50]
    never = [n for n in first50[:16] if n not in last]
    assert len(never) == 16, (
        f"positions 1-16 must be the never-checked spill; already-green keys "
        f"found: {[n for n in first50[:16] if n in last]}"
    )
    stale = [n for n in first50[16:] if last.get(n) == 2]
    assert len(stale) >= 30, (
        f"only {len(stale)} of positions 17-50 are r2-era re-greens — "
        "the staleness rotation regressed (VERDICT r4 #2 wants >=30)"
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
    for name in oracles:
        schema = qs[name](spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        "oracle-bearing queries with driver-unhashable top-level columns "
        f"(pandas sort_values cannot hash them): {offenders}"
    )


def test_every_query_key_is_unique_and_wellformed():
    qs = all_queries()
    assert len(qs) == len(set(qs))  # dict, but guards accidental re-keying
    bad = [n for n in qs if not n.startswith("q_") or " " in n]
    assert not bad, f"malformed query keys: {bad}"
