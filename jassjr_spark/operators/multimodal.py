"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED (no imaging/audio
libraries in this container — see ``decode_image``): it produces a
deterministic fake feature vector derived from the payload bytes, while the
Spark-side plumbing — schema, batch iteration, partitioning, UDF signatures —
is real and tested. Swapping the stub for PIL/ffmpeg is a one-function
change that alters no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("payload", T.BinaryType(), False),   # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
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


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        rows.append((i, kinds[i % 3], bytearray(payload), 64, 48, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB decode: real systems call PIL/libvips here.

    Deterministic fake: fold the payload bytes into ``dim`` float means so
    the downstream feature pipeline has stable, content-derived values.
    Raises on empty payload like a real decoder would.
    """
    if not payload:
        raise ValueError("empty media payload")
    arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
    return arr.reshape(-1, dim).mean(axis=0) / 255.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media -> (media_id, kind, n_bytes, feature array<float>).

    Arrow-batched mapInPandas; one Python worker call per input batch, the
    decode loop is per-row only inside the batch (unavoidable for binary
    decodes; this is exactly how a PIL-based pipeline would run)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image rows -> same rows with payload re-encoded at (width, height).

    The pixel work is STUBBED (no PIL/libvips in this container): the
    output payload is a deterministic content-derived stand-in sized
    width*height bytes, so downstream stages see realistic batch shapes
    and data volumes. The Spark plumbing — kind filter, Arrow-batched
    mapInPandas, metadata rewrite, schema — is the real pipeline; swapping
    the stub for `PIL.Image.resize` changes one function and no plan.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                if not p:
                    raise ValueError("empty media payload")
                seed = hashlib.sha256(
                    bytes(p) + f":{width}x{height}".encode()
                ).digest()
                payloads.append((seed * (n // len(seed) + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen, schema=RESIZED_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """video rows -> (media_id, frame_ts_ms) sample grid; metadata-driven,
    pure Column math (the decode of each frame would be another
    mapInPandas stage over (media_id, frame_ts_ms, payload))."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
