"""Registry / driver-contract invariants.

The driver checks the FIRST 50 queries in iteration order against their
oracles — these tests pin the properties that make that budget count:
every exposed query is callable, every first-50 entry carries an oracle,
and the round-3 rotation (8 round-1-only declared keys + 42
never-driver-checked extensions) stays at the front until the next
deliberate rotation.
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


def test_rotation_spends_budget_on_new_rows():
    """Round-3 contract: the 50-entry budget buys >=40 never-driver-checked
    rows (cumulative driver-green >=107/136 was the verdict target)."""
    checked = set()
    for f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(REPO, f)
        if os.path.exists(path):
            checked |= set(json.load(open(path)))
    first50 = list(all_queries().keys())[:50]
    fresh = [n for n in first50 if n not in checked]
    assert len(fresh) >= 40, (
        f"only {len(fresh)} of the first 50 are new driver rows — "
        "the rotation regressed"
    )


def test_every_query_key_is_unique_and_wellformed():
    qs = all_queries()
    assert len(qs) == len(set(qs))  # dict, but guards accidental re-keying
    bad = [n for n in qs if not n.startswith("q_") or " " in n]
    assert not bad, f"malformed query keys: {bad}"
