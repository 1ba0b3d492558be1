"""graph_vulcan_assets_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the public
adevinta/graph-vulcan-assets repository (a Go streaming ETL job that
maintains a temporal property graph of security assets), generalized into a
full relational + streaming + LLM-data-pipeline operator inventory, built
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured Streaming
for ingestion, Pandas UDFs only where built-ins cannot express the semantics.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``tables``     parquet table loaders / temp-view registration
- ``registry``   declarative query registry consumed by ``__spark_entry__``
- ``operators``  relational operator inventory (scans, filters, joins,
                 aggregates, windows, sorts, set ops)
- ``functions``  scalar function families (string/date/math/json/array/map)
- ``plans``      temporal-graph semantics of the reference (replay, upsert,
                 tombstone expiry, cascade expiry, point-in-time)
- ``streaming``  Structured Streaming ingestion (file/Kafka source,
                 foreachBatch merge sink)
- ``llm``        LLM-data-pipeline operators (dedup, similarity search,
                 text analysis, multimodal plumbing)
"""

from graph_vulcan_assets_spark.session import get_spark
from graph_vulcan_assets_spark.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
