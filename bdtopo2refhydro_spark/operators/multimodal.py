"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libraries in this container —
clearly marked below); the Spark-side plumbing is real: schema, Arrow batch
shape, mapInPandas iterator contract, and partition sizing are exactly what
a production decode would use. Swap `_decode_image_stub` for a PIL/ffmpeg
call and nothing else changes.

At scale: binary payloads dominate partition size, so `media_repartition`
splits by byte budget, not row count — 128 MB of payload per task keeps
Arrow batches inside executor memory regardless of document skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB: deterministic fake decode (no PIL/libjpeg in this container).
    A real deployment replaces this body with
    ``img = PIL.Image.open(io.BytesIO(payload))`` and a model-backed
    featurizer; the (width, height, float32[8]) contract is unchanged."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feats = np.frombuffer(digest[:32], dtype=np.uint8).astype(np.float32)
    feats = feats / 255.0
    return width, height, feats[:8]


def extract_image_features(media: DataFrame, payload_col: str = "html",
                           batch_hint: int = 256) -> DataFrame:
    """mapInPandas featurization: iterator-of-batches in, iterator out —
    the decode never materializes a whole partition."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                w, h, f = _decode_image_stub(bytes(payload))
                out.append(
                    {"url": url, "media_type": "image/stub",
                     "n_bytes": len(payload), "width": int(w),
                     "height": int(h), "features": f.tolist()}
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.select("url", payload_col).mapInPandas(
        _featurize, IMAGE_FEATURES_SCHEMA
    )


def media_repartition(df: DataFrame, payload_col: str = "html",
                      target_bytes_per_task: int = 128 * 1024 * 1024) -> DataFrame:
    """Byte-budget repartition for binary-heavy tables: estimates total
    payload bytes from a cheap aggregate and repartitions so each task
    holds ~target_bytes_per_task. Row-count partitioning would let one
    partition of large media blow executor memory."""
    total = df.select(
        F.sum(F.length(F.col(payload_col)).cast("long")).alias("b")
    ).first()["b"] or 0
    n_parts = max(1, int(total // target_bytes_per_task) + 1)
    return df.repartition(n_parts)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("loudness", T.FloatType()),
    ]
)


def _decode_audio_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB: deterministic fake decode (no ffmpeg/librosa in this
    container). A real deployment replaces this body with an ffprobe/pcm
    decode; the (duration_ms, sample_rate, loudness) contract is
    unchanged."""
    digest = hashlib.sha256(payload).digest()
    duration_ms = 1000 + int.from_bytes(digest[0:2], "big")
    sample_rate = (8, 16, 22, 44)[digest[2] % 4] * 1000
    # /256 not /255: power-of-two denominator → exact in float32 AND
    # float64, so the DuckDB oracle (doubles) matches bit-for-bit
    loudness = digest[3] / 256.0
    return duration_ms, sample_rate, loudness


def extract_audio_features(media: DataFrame, payload_col: str = "payload",
                           ) -> DataFrame:
    """mapInPandas audio featurization — same iterator contract as
    extract_image_features."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                d, sr, loud = _decode_audio_stub(bytes(payload))
                out.append({"url": url, "n_bytes": len(payload),
                            "duration_ms": d, "sample_rate": sr,
                            "loudness": loud})
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return media.select("url", payload_col).mapInPandas(
        _featurize, AUDIO_FEATURES_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_video_frames(media: DataFrame, payload_col: str = "payload",
                        every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame — a
    row-expanding mapInPandas (the shape a real ffmpeg key-frame extractor
    produces). The stub derives a deterministic per-video duration and
    per-frame digest from the payload; swap `_decode_audio_stub`-style
    internals for ffmpeg and the schema/partitioning stays identical.
    At scale, run media_repartition() first so the byte-heavy input is
    partitioned by payload size, not row count."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                hx = hashlib.sha256(b).hexdigest()
                digest = bytes.fromhex(hx)
                duration_ms = 1000 + int.from_bytes(digest[0:2], "big")
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    # hex-string chaining (not raw-byte concat) keeps the
                    # derivation replayable in VARCHAR-only SQL sha256
                    fr = hashlib.sha256(f"{hx}#{i}".encode()).hexdigest()
                    out.append({"url": url, "frame_idx": i, "ts_ms": ts,
                                "frame_sha": fr})
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("url", payload_col).mapInPandas(_sample, FRAME_SCHEMA)
