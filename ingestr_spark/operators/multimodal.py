"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payloads with typed metadata; all Spark-side
mechanics — schema, partitioning, Arrow batch shape, UDF signatures — are
real and tested. The actual decode (PIL/ffmpeg/torchaudio) is NOT available
in this container, so the decode kernel is stubbed: ``decoder="fake"`` is a
deterministic stand-in (byte-statistics pseudo-features) and
``decoder="real"`` raises ``NotImplementedError`` where the library call
would go. Swapping in a real decoder changes ONE function body, no plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
])

N_FEATURES = 16


def synth_media(spark, n_rows: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id."""
    return spark.range(n_rows).select(
        F.format_string("m-%09d", "id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(
            F.concat(F.lit("PAYLOAD:"), F.sha2(F.col("id").cast("string"), 256)), "utf-8"
        ).cast("binary").alias("payload"),
        (F.col("id") % 640 + 32).cast("int").alias("width"),
        (F.col("id") % 480 + 32).cast("int").alias("height"),
        (F.col("id") % 30000).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )


def _fake_decode(payload: bytes, n: int = N_FEATURES) -> np.ndarray:
    """Deterministic pseudo-features from byte statistics (the stub)."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(arr) == 0:
        return np.zeros(n)
    chunks = np.array_split(arr, n)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks]) / 255.0


def extract_features(
    df: DataFrame, decoder: str = "fake", batch_limit: int = 1024
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, feature vectors
    out. Partition by media_id upstream if payload sizes are skewed."""
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # real decode would be: PIL.Image.open(io.BytesIO(p)) etc.
                raise NotImplementedError(
                    "image/audio decode libraries are not available in this "
                    "environment; use decoder='fake'"
                )
            feats = [
                _fake_decode(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return df.mapInPandas(run, out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize = metadata rewrite + (stubbed) payload transform. The plumbing
    (column rewrite, schema) is real; payload passes through untouched."""
    return df.withColumn("width", F.lit(width).cast("int")).withColumn(
        "height", F.lit(height).cast("int")
    ).withColumn("codec", F.concat(F.col("codec"), F.lit(f";resized={width}x{height}")))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (sequence + explode — distributed, no UDF). A real sampler would decode
    at these offsets."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
