"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — schema contract, Arrow
batch shape, ``mapInPandas`` iterator protocol, partition sizing — and so
is the codec step: ``decode_stub=False`` runs the pure-stdlib PNG / WAV /
RVID codecs (operators/codecs.py) on genuinely encoded payloads
(``synthesize_media_real``); ``decode_stub=True`` keeps the original
md5-derived stand-in features for the plumbing-only fixture.

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


# real-codec fixture dimensions (small on purpose: the oracle mirrors the
# generative byte formula per pixel/sample)
IMG_W, IMG_H = 8, 8
AUDIO_SAMPLES, AUDIO_RATE = 128, 16000
VID_W, VID_H, VID_FRAMES = 4, 4, 4

FEATURES_REAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def synthesize_media_real(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic REAL media table: genuinely encoded PNG / WAV / RVID
    payloads whose content bytes come from the md5 block formula
    (codecs.det-style: block b of media i = md5(f"{seed}:{i}:{b}")), so an
    independent engine can recompute the decoded statistics without the
    codec."""
    from .codecs import det_bytes, png_encode, rvid_encode, wav_encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def content(i: int, n_bytes: int) -> bytes:
            # single source of truth for the generative formula (codecs)
            return det_bytes(f"{seed}:{i}", n_bytes)

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    pix = content(i, IMG_W * IMG_H * 3)
                    payload = png_encode(pix, IMG_W, IMG_H)
                    w, h, dur = IMG_W, IMG_H, 0
                elif kind == "audio":
                    raw = content(i, AUDIO_SAMPLES * 2)
                    samples = [
                        _struct.unpack(">H", raw[2 * j : 2 * j + 2])[0] - 32768
                        for j in range(AUDIO_SAMPLES)
                    ]
                    payload = wav_encode(samples, AUDIO_RATE)
                    w, h, dur = 0, 0, AUDIO_SAMPLES * 1000 // AUDIO_RATE
                else:
                    size = VID_W * VID_H * 3
                    raw = content(i, size * VID_FRAMES)
                    frames = [raw[f * size : (f + 1) * size] for f in range(VID_FRAMES)]
                    payload = rvid_encode(frames, VID_W, VID_H)
                    w, h, dur = VID_W, VID_H, VID_FRAMES * 40
                rows.append((i, kind, payload, w, h, dur))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "width", "height", "duration_ms"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _real_features(payload: bytes, kind: str) -> list[float]:
    """Decode the payload with the real codec and featurize from EXACT
    integer statistics (bit-reproducible by the oracle: integer sums, then
    fixed IEEE divisions/sqrt)."""
    import math

    from .codecs import png_decode, rvid_decode, wav_decode

    f = [0.0] * FEATURE_DIM
    if kind == "image":
        pixels, w, h = png_decode(payload)
        n = w * h
        f[0] = (sum(pixels) / (n * 3)) / 255.0
        for c in range(3):
            f[1 + c] = (sum(pixels[c::3]) / n) / 255.0
        f[4], f[5] = w / 4096.0, h / 4096.0
    elif kind == "audio":
        samples, _rate = wav_decode(payload)
        n = len(samples)
        f[0] = (sum(samples) / n) / 32768.0
        f[1] = math.sqrt(sum(s * s for s in samples) / n) / 32768.0
        f[2] = max(abs(s) for s in samples) / 32768.0
        f[3] = n / 65536.0
    else:
        frames, w, h = rvid_decode(payload)
        total = sum(sum(fr) for fr in frames)
        f[0] = (total / (len(frames) * w * h * 3)) / 255.0
        f[1], f[2], f[3] = len(frames) / 256.0, w / 4096.0, h / 4096.0
    return f


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow-batched).

    ``decode_stub=True`` keeps the md5 stand-in features (plumbing oracle);
    ``decode_stub=False`` runs the REAL pure-stdlib codecs (PNG / WAV /
    RVID, operators/codecs.py) and emits double-precision features derived
    from exact integer statistics of the decoded pixels/samples.

    The iterator-of-DataFrames protocol is the real production shape: each
    pandas batch is one Arrow record batch; memory stays bounded regardless
    of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
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
            else:
                feats = [
                    _real_features(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "features": feats,
                    }
                )

    schema = FEATURES_SCHEMA if decode_stub else FEATURES_REAL_SCHEMA
    return df.mapInPandas(run, schema=schema)


def resize_images(df: DataFrame, max_side: int = 512, decode_stub: bool = True) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side (pure column math);
    the pixel resample itself is the stubbed decode step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        # non-image rows carry 0x0 dims; clamp to 1 to keep ANSI division happy
        / F.greatest(F.col("width"), F.col("height"), F.lit(1)).cast("double"),
    )
    out = df.withColumn(
        "target_width", F.greatest(F.lit(1), F.round(F.col("width") * scale).cast("int"))
    ).withColumn(
        "target_height", F.greatest(F.lit(1), F.round(F.col("height") * scale).cast("int"))
    )
    if decode_stub:
        return out

    # real path: nearest-neighbor resample of PNG payloads via the stdlib
    # codec (non-image rows pass through untouched)
    from .codecs import png_decode, png_encode

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for p, kind, w0, h0, tw, th in zip(
                pdf["payload"], pdf["kind"], pdf["width"], pdf["height"],
                pdf["target_width"], pdf["target_height"],
            ):
                if kind != "image":
                    # non-image rows pass through untouched — payload AND dims
                    payloads.append(p)
                    widths.append(w0)
                    heights.append(h0)
                    continue
                pixels, w, h = png_decode(p)
                tw, th = int(tw), int(th)
                resized = bytearray()
                for y in range(th):
                    sy = y * h // th
                    for x in range(tw):
                        sx = x * w // tw
                        o = (sy * w + sx) * 3
                        resized.extend(pixels[o : o + 3])
                payloads.append(png_encode(bytes(resized), tw, th))
                widths.append(tw)
                heights.append(th)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["width"] = widths
            pdf["height"] = heights
            yield pdf.drop(columns=["target_width", "target_height"])

    return out.mapInPandas(resample, schema=MEDIA_SCHEMA)


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
