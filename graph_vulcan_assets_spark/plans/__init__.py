"""Temporal-graph semantics of the reference (SURVEY.md §2.9, §3)."""

import graph_vulcan_assets_spark.plans.temporal_queries  # noqa: F401
