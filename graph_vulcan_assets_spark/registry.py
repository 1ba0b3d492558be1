"""Declarative query registry.

Every operator from SURVEY.md §2 registers itself here with an optional
DuckDB oracle SQL string. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry.

Contract (driver t2): the Spark callable and the oracle SQL must produce the
same row multiset with the same column names — every computed column is
aliased identically on both sides, and floating aggregates are rounded the
same way on both sides to absorb summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import graph_vulcan_assets_spark.operators  # noqa: F401
    import graph_vulcan_assets_spark.functions  # noqa: F401
    import graph_vulcan_assets_spark.plans  # noqa: F401
    import graph_vulcan_assets_spark.llm  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)


def describe() -> list[dict[str, Any]]:
    load_all()
    return [
        {"name": n, "oracle": n in ORACLE, "doc": (f.__doc__ or "").strip().splitlines()[0] if f.__doc__ else ""}
        for n, f in sorted(QUERIES.items())
    ]
