"""Relational operator inventory (SURVEY.md §2.1–§2.7).

Importing this package registers every operator query in the registry.
"""

import graph_vulcan_assets_spark.operators.scans  # noqa: F401
import graph_vulcan_assets_spark.operators.filters  # noqa: F401
import graph_vulcan_assets_spark.operators.joins  # noqa: F401
import graph_vulcan_assets_spark.operators.aggregates  # noqa: F401
import graph_vulcan_assets_spark.operators.windows  # noqa: F401
import graph_vulcan_assets_spark.operators.sorts_sets  # noqa: F401
import graph_vulcan_assets_spark.operators.skew  # noqa: F401
import graph_vulcan_assets_spark.operators.bucketing  # noqa: F401
import graph_vulcan_assets_spark.operators.composites  # noqa: F401
import graph_vulcan_assets_spark.operators.graph  # noqa: F401
import graph_vulcan_assets_spark.operators.profiling  # noqa: F401
import graph_vulcan_assets_spark.operators.histograms  # noqa: F401
import graph_vulcan_assets_spark.operators.subqueries  # noqa: F401
import graph_vulcan_assets_spark.operators.analytics  # noqa: F401
import graph_vulcan_assets_spark.operators.sketches  # noqa: F401
import graph_vulcan_assets_spark.operators.dq  # noqa: F401
import graph_vulcan_assets_spark.operators.linkage  # noqa: F401
import graph_vulcan_assets_spark.operators.scd  # noqa: F401
