"""Scalar function families (SURVEY.md §2.8) + table functions (§2.10)."""

import graph_vulcan_assets_spark.functions.scalars  # noqa: F401
import graph_vulcan_assets_spark.functions.tablefn  # noqa: F401
