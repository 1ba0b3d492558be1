"""LLM-data-pipeline operators (SURVEY.md §2.11): dedup, similarity search,
text analysis, multimodal column plumbing."""

import graph_vulcan_assets_spark.llm.dedup  # noqa: F401
import graph_vulcan_assets_spark.llm.similarity  # noqa: F401
import graph_vulcan_assets_spark.llm.text  # noqa: F401
import graph_vulcan_assets_spark.llm.clustering  # noqa: F401
import graph_vulcan_assets_spark.llm.curation  # noqa: F401
import graph_vulcan_assets_spark.llm.multimodal  # noqa: F401
import graph_vulcan_assets_spark.llm.embeddings  # noqa: F401
import graph_vulcan_assets_spark.llm.kmeans  # noqa: F401
import graph_vulcan_assets_spark.llm.pq  # noqa: F401
import graph_vulcan_assets_spark.llm.quality  # noqa: F401
import graph_vulcan_assets_spark.llm.normalize  # noqa: F401
import graph_vulcan_assets_spark.llm.semdedup  # noqa: F401
import graph_vulcan_assets_spark.llm.spans  # noqa: F401
import graph_vulcan_assets_spark.llm.bpe  # noqa: F401
import graph_vulcan_assets_spark.llm.features  # noqa: F401
