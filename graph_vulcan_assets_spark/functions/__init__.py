"""Scalar function families (SURVEY.md §2.8)."""

import graph_vulcan_assets_spark.functions.scalars  # noqa: F401
