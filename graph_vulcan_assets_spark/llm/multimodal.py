"""Multimodal column plumbing (north-star extension).

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata, processed by Arrow-batched `mapInPandas` stages. The container
has no media libraries, so the decode kernels are STUBS — a deterministic
fake feature extractor and a clearly-marked NotImplementedError for real
decoding — but everything Spark-side is real and tested: schemas, batch
iteration, partition sizing, UDF signatures.

Scale notes: media rows are large and skewed; the operators repartition by
a content-hash bucket before the Python stage so Arrow batches are evenly
sized, and they project metadata-only columns wherever the binary payload
is not needed (column pruning keeps multi-MB blobs out of shuffles).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires a media library not present in this
    environment. The Spark pipeline around it is fully functional; swap
    this stub for PIL/ffmpeg in a real deployment."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "container; use fake_features() for pipeline testing"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a learned embedding: byte-histogram
    moments. Pure-Python/NumPy-free so it runs anywhere."""
    if len(payload) == 0:
        return [0.0] * dim
    return [
        float(sum(payload[i::dim]) % 997) / 997.0 for i in range(dim)
    ]


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature-extraction stage (Arrow-batched).

    The iterator contract keeps peak memory at one Arrow batch per task
    regardless of partition size — the correct shape for multi-MB payloads
    at 100 TB.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": part["media_id"],
                        "kind": part["kind"],
                        "n_bytes": part["payload"].map(len).astype("int64"),
                        "feature": part["payload"].map(_fake_feature),
                    }
                )

    # even out skewed payload sizes before the Python stage
    bucketed = media.repartition(F.pmod(F.xxhash64("media_id"), F.lit(64)))
    return bucketed.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps JVM-side (sequence + explode — no Python), ready for a
    decode stage. Demonstrates that the expensive row-expansion is a
    built-in operation; only the pixel decode would be a UDF."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = patterned bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range((i % 5 + 1) * 100))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                (i + 1) * 500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
