"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — schema contract, Arrow
batch shape, ``mapInPandas`` iterator protocol, partition sizing — while the
actual codec step is stubbed (no image/audio libraries in this container):
``decode_stub=True`` produces a deterministic fake feature vector from the
bytes; ``decode_stub=False`` raises ``NotImplementedError`` at the exact
point a real decoder (PIL / torchaudio / pyav) would be invoked.

Design rules encoded here:
  * media bytes travel as one ``binary`` column next to typed metadata
    (media_id, kind, width/height/duration, byte length) — never exploded
    into Python objects outside an Arrow batch;
  * all Python work happens in ``mapInPandas`` over Arrow record batches
    (vectorized transfer, bounded by spark.sql.execution.arrow.
    maxRecordsPerBatch), never in per-row UDFs;
  * decode -> feature-extract emits fixed-width ``array<float>`` so the
    output flows straight into the similarity/dedup operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata typed."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            F.pmod(F.col("id"), 3).cast("int") + 1,
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.md5(F.concat(F.lit(seed), F.col("id")))), "utf-8"
        ).cast("binary").alias("payload"),
        (F.pmod(F.col("id") * 37, 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.col("id") * 53, 1080) + 1).cast("int").alias("height"),
        (F.pmod(F.col("id") * 97, 60000) + 1).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for decode + feature extraction: md5 of the
    payload expanded into FEATURE_DIM floats in [0, 1)."""
    digest = hashlib.md5(payload).digest()
    ints = [int.from_bytes(digest[i : i + 2], "big") for i in range(0, 16, 2)]
    base = [v / 65536.0 for v in ints]
    return (base * ((FEATURE_DIM // len(base)) + 1))[:FEATURE_DIM]


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow-batched).

    The iterator-of-DataFrames protocol is the real production shape: each
    pandas batch is one Arrow record batch; memory stays bounded regardless
    of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                # real deployment: PIL.Image.open / torchaudio.load / pyav here
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in this environment"
                )
            feats = [
                _fake_decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 512, decode_stub: bool = True) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side (pure column math);
    the pixel resample itself is the stubbed decode step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    out = df.withColumn(
        "target_width", F.greatest(F.lit(1), F.round(F.col("width") * scale).cast("int"))
    ).withColumn(
        "target_height", F.greatest(F.lit(1), F.round(F.col("height") * scale).cast("int"))
    )
    if not decode_stub:
        raise NotImplementedError("pixel resampling requires an image codec")
    return out


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp,
    computed JVM-side with sequence+explode; frame decode is the stub."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") - 1), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames
