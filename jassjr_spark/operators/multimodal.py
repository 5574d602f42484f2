"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

The decode step is REAL for the formats decodable from public specs with
the stdlib alone (functions/codecs.py): PNG (zlib inflate + unfilter),
24-bit BMP, and 16-bit PCM WAV. Payloads in other formats (JPEG, video
containers — entropy coders/demuxers genuinely need external libraries
this container does not ship) fall back to a clearly-marked deterministic
byte-fold feature so the pipeline shape stays total; swapping the
fallback for PIL/ffmpeg changes one function and no plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jassjr_spark.functions import codecs

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
        T.StructField("format", T.StringType(), False),    # png|bmp|wav|unknown
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: REAL payloads — image rows
    alternate PNG and BMP (seeded gradient pixels), audio rows are PCM
    WAV (seeded sine mixtures), video rows are opaque seeded bytes (the
    declared-stub format)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        rng = np.random.default_rng(1000 + i)
        if kind == "image":
            img = (
                np.add.outer(np.arange(48) * 2, np.arange(64) * 3)[:, :, None]
                + rng.integers(0, 64, (48, 64, 3))
            ).astype(np.uint8)
            payload = (
                codecs.encode_png(img) if i % 2 == 0 else codecs.encode_bmp(img)
            )
            rows.append((i, kind, bytearray(payload), 64, 48, None))
        elif kind == "audio":
            t = np.arange(1600, dtype=np.float32) / 8000.0
            wave_ = 0.5 * np.sin(2 * np.pi * (200 + 50 * (i % 7)) * t)
            payload = codecs.encode_wav(wave_, 8000)
            rows.append((i, kind, bytearray(payload), None, None, 200))
        else:
            payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
            rows.append((i, kind, bytearray(payload), 64, 48, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fold_bytes(payload: bytes, dim: int) -> np.ndarray:
    """Declared FALLBACK for undecodable formats (JPEG/video): fold the
    payload bytes into ``dim`` float means — deterministic and
    content-derived, but NOT pixel/sample data."""
    arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
    return arr.reshape(-1, dim).mean(axis=0) / 255.0


def _band_means(values: np.ndarray, dim: int) -> np.ndarray:
    """Mean of ``values`` over ``dim`` contiguous bands (the classic
    fixed-length pooling of a variable-length signal)."""
    n = len(values)
    if n == 0:
        return np.zeros(dim, np.float32)
    edges = (np.arange(dim + 1) * n) // dim
    return np.array(
        [values[edges[i]:max(edges[i + 1], edges[i] + 1)].mean()
         for i in range(dim)],
        np.float32,
    )


def decode_image(payload: bytes, dim: int = 8) -> np.ndarray:
    """Image payload -> ``dim`` float features.

    PNG/BMP payloads are REALLY decoded (functions/codecs.py) and pooled:
    per-band luminance means over ``dim`` horizontal bands, normalized to
    [0, 1]. Other formats fall back to the declared byte-fold stub.
    Raises on empty payload like a real decoder would."""
    if not payload:
        raise ValueError("empty media payload")
    fmt = codecs.sniff(payload)
    if fmt == "png":
        px = codecs.decode_png(payload)
    elif fmt == "bmp":
        px = codecs.decode_bmp(payload)
    else:
        return _fold_bytes(payload, dim)
    lum = px.astype(np.float32).mean(axis=(1, 2))  # per-row luminance
    return _band_means(lum, dim) / 255.0


def decode_audio(payload: bytes, dim: int = 8) -> np.ndarray:
    """Audio payload -> ``dim`` float features: per-band RMS energy of
    the decoded PCM signal (WAV); byte-fold fallback otherwise."""
    if not payload:
        raise ValueError("empty media payload")
    if codecs.sniff(payload) != "wav":
        return _fold_bytes(payload, dim)
    samples, _rate = codecs.decode_wav(payload)
    mono = samples.mean(axis=1)
    return np.sqrt(_band_means(mono * mono, dim))


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media -> (media_id, kind, format, n_bytes, feature array<float>).

    Arrow-batched mapInPandas; one Python worker call per input batch,
    the decode loop is per-row only inside the batch (exactly how a
    PIL-based pipeline would run). ``format`` records what the sniffer
    saw, so downstream can tell real decodes from byte-fold fallbacks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, fmts = [], []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                fmts.append(codecs.sniff(p))
                dec = decode_audio if kind == "audio" else decode_image
                feats.append(dec(p, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": fmts,
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

    PNG/BMP payloads are REALLY resized: decode -> nearest-neighbor
    resample (codecs.resize_nearest) -> re-encode in the SAME format.
    Other formats get the declared deterministic stand-in payload sized
    width*height bytes (swap for PIL to make those real too — one
    function, no plan change)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                if not p:
                    raise ValueError("empty media payload")
                fmt = codecs.sniff(p)
                if fmt == "png":
                    px = codecs.resize_nearest(
                        codecs.decode_png(p), width, height
                    )
                    payloads.append(codecs.encode_png(px))
                elif fmt == "bmp":
                    px = codecs.resize_nearest(
                        codecs.decode_bmp(p), width, height
                    )
                    payloads.append(codecs.encode_bmp(px))
                else:
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
