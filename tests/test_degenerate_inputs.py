"""Degenerate-input robustness: every registered query must handle EMPTY
and NEAR-EMPTY tables without crashing.

At 100 TB this is not an edge case: heavy filters, partition pruning, and
backfill windows routinely hand operators zero or near-zero rows — a
training job that crashes at 3 a.m. because one day's partition is empty
(np.vstack on nothing, approxQuantile returning [], k-means with fewer
points than clusters, BPE over an empty vocabulary) is an operational
incident. Round-5 probe result being pinned here: 187/187 queries return
cleanly (0 rows is fine; obscure internals crashes are not) on both a
fully-empty and a 2-rows-per-table snapshot of the standard schema.

The sweeps construct the degenerate dirs from the test SF's parquet (so
schemas — including nanosecond-timestamp quirks in events — stay exactly
what `tables.load_table` expects), then call every `queries()` entry.
Marked slow: two full-registry sweeps cost a few minutes of scheduling
latency even though no data moves.
"""

from __future__ import annotations

import glob
import os

import pytest

from graph_vulcan_assets_spark.registry import all_queries

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _build_degenerate_dir(out: str, src: str, limit: int) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT {limit}) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )


def _sweep(spark, deg_dir: str) -> dict[str, str]:
    failures: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            fn(spark, deg_dir).count()
        except Exception as e:  # noqa: BLE001 — we report, not mask
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
    return failures


@pytest.mark.slow
@pytest.mark.parametrize("limit", [0, 2], ids=["empty", "two_rows"])
def test_every_query_survives_degenerate_tables(spark, sf_dir, tmp_path, limit):
    deg = str(tmp_path / f"deg{limit}")
    _build_degenerate_dir(deg, sf_dir, limit)
    # sanity: the dir really is degenerate
    assert len(glob.glob(os.path.join(deg, "*.parquet"))) == len(TABLES)

    failures = _sweep(spark, deg)
    assert not failures, (
        f"{len(failures)} queries crash on {limit}-row tables:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(failures.items()))
    )
