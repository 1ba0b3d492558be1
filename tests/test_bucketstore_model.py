"""Model-based property test for BucketTable (sources/bucketstore.py).

The example tests in test_bucketstore.py pin each behavior once; this
drives RANDOM operation sequences (upsert / delete / compact) against a
plain-dict model and checks the live view after every step plus time
travel against the full recorded history at the end. This is the class
of test that catches interaction bugs no hand-written sequence covers —
e.g. delete-then-upsert on the same bucket in adjacent commits, compact
racing version pruning, or an upsert resurrecting a deleted key.

hypothesis generates the op sequences; a module-scoped cap on examples
keeps this inside the quick gate (each step is a real Spark write).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_vulcan_assets_spark.sources.bucketstore import BucketTable

# keys drawn from a small pool so collisions (the interesting case: same
# key touched by several ops, same bucket touched by upsert+delete) are
# frequent rather than rare
_KEY = st.integers(min_value=0, max_value=24)

_OP = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(st.tuples(_KEY, st.integers(0, 999)), min_size=1, max_size=6),
    ),
    st.tuples(st.just("delete"), st.lists(_KEY, min_size=1, max_size=4)),
    st.tuples(st.just("compact"), st.just(None)),
)


def _view(table: BucketTable) -> dict[int, int]:
    return {r["k"]: r["v"] for r in table.read().collect()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=1, max_size=8))
def test_random_op_sequences_match_dict_model(spark, tmp_path_factory, ops):
    table = BucketTable(
        spark,
        str(tmp_path_factory.mktemp("bt") / "t"),
        key_cols=["k"],
        n_buckets=4,
        keep_versions=2,
    )
    model: dict[int, int] = {}
    history: list[tuple[int, dict[int, int]]] = []

    for op, arg in ops:
        if table._schema is None and op != "upsert":
            continue  # nothing written yet: no schema to type rows by
        if op == "upsert":
            # last-wins within a batch, matching MERGE semantics: dedupe
            # the generated rows by key before handing them to the table
            batch = {k: v for k, v in arg}
            version = table.upsert(
                spark.createDataFrame(
                    [(k, v) for k, v in batch.items()], ["k", "v"]
                )
            )
            model.update(batch)
            history.append((version, dict(model)))
        elif op == "delete":
            version = table.delete(
                spark.createDataFrame([(k,) for k in set(arg)], ["k"])
            )
            for k in arg:
                model.pop(k, None)
            history.append((version, dict(model)))
        else:
            table.compact()
            # compact must not change the live view, but it forfeits time
            # travel before the compaction point (documented VACUUM trade)
            history.clear()

        if table._schema is not None:
            assert _view(table) == model, f"live view diverged after {op}"

    # time travel: faithful only within the per-bucket pruning window
    # (keep_versions=2), so check the LAST TWO commits — enough to cover
    # the interesting adjacencies (delete→upsert, upsert→delete) without
    # asserting views pruning has legitimately discarded
    for version, snapshot in history[-2:]:
        got = {r["k"]: r["v"] for r in table.read(version=version).collect()}
        assert got == snapshot, f"time travel to {version} diverged"


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=4, max_size=14))
def test_random_op_sequences_match_dict_model_deep(
    spark, tmp_path_factory, ops
):
    test_random_op_sequences_match_dict_model.hypothesis.inner_test(
        spark, tmp_path_factory, ops
    )
