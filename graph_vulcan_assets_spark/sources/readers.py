"""File-format readers: CSV / JSON-lines / ORC with explicit schemas.

The reference's only sources are Kafka and JSON fixture files
(stream/streamtest/streamtest.go:14-60); the engine generalizes to the
standard lake formats. Policy: ALWAYS explicit schemas — inference scans
the data twice and produces unstable types at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_round_trip_formats(df: DataFrame, base_dir: str) -> dict[str, str]:
    """Write a frame as csv/json/orc side by side (test/demo helper)."""
    paths = {}
    for fmt in ("csv", "json", "orc"):
        out = f"{base_dir}/{fmt}"
        writer = df.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        writer.format(fmt).save(out)
        paths[fmt] = out
    return paths
