"""Connected-components clustering tests."""

from __future__ import annotations

from graph_vulcan_assets_spark.llm.clustering import (
    connected_components,
    keep_one_per_cluster,
)


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, isolated 99 not in edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    comps = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in [1, 2, 3, 4, 10, 11, 99]],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    comps = connected_components(edges).selectExpr("node AS doc_id", "component")
    kept = sorted(r["doc_id"] for r in keep_one_per_cluster(docs, comps).collect())
    # one survivor per cluster (the min) + the isolated doc
    assert kept == [1, 10, 99]


def test_long_chain_converges(spark):
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id long, b_id long"
    )
    comps = connected_components(edges, max_iter=40).collect()
    assert {r["component"] for r in comps} == {0}
    assert len(comps) == n + 1


def test_non_convergence_raises_loudly(spark):
    """Round-4 fix: exhausting max_iter used to return a silently SPLIT
    labeling — downstream leakage-safe splits would then leak one
    near-dup group across train/test. A chain of diameter > max_iter
    must raise, and the same chain converges with enough iterations."""
    import pytest

    n = 12
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    ok = connected_components(chain, max_iter=n + 2)
    assert {r.component for r in ok.collect()} == {0}
