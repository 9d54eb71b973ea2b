"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not in the reference (Dug's `type` mentions "image" as a study modality
only); required for a training-data pipeline over mixed-modality corpora.

Design: media travel as ``binary`` columns with a typed metadata struct
(mime, width/height or sample-rate, duration).  Per-item work (decode,
feature-extract, resize, frame-sample) runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, partition preservation,
batch shape) is real and tested; the codec calls themselves are STUBBED
behind ``media_codec`` (the image/audio libraries are not in this
container): decode raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces a seeded, content-derived fake
so pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def media_codec(payload: bytes, mime: str, deterministic_fake: bool):
    """The stubbed decode boundary.  Real deployment: swap in
    PIL/torchaudio/pyav here — the Spark plumbing doesn't change."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in this "
            "container; pass deterministic_fake=True for the seeded stub"
        )
    # content-derived fake: stable 16-dim feature from the payload digest
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:16]]


def extract_features(
    media: DataFrame, deterministic_fake: bool = False, batch_note: str = "feature"
) -> DataFrame:
    """binary payload → fixed-width feature vector via mapInPandas.
    Narrow (no shuffle); Arrow batches bound executor memory."""
    fake = deterministic_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                media_codec(bytes(p) if p is not None else b"", m, fake)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("object"),
                    "mime": pdf["mime"].astype("object"),
                    "features": pd.Series(feats, dtype="object"),
                }
            )

    return media.select("media_id", "mime", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame, width: int, height: int, deterministic_fake: bool = False
) -> DataFrame:
    """Image resize: stub returns a deterministic truncated payload (real
    impl: PIL resize inside the same batch loop)."""
    fake = deterministic_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, m in zip(pdf["payload"], pdf["mime"]):
                if not fake:
                    raise NotImplementedError("image codecs unavailable; see media_codec")
                raw = bytes(p) if p is not None else b""
                out.append(hashlib.sha256(raw + f"{width}x{height}".encode()).digest())
            res = pdf.copy()
            res["payload"] = pd.Series(out, dtype="object")
            res["width"] = width
            res["height"] = height
            yield res

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row
    explosion inside mapInPandas, the canonical 1→N media op)."""
    fake = deterministic_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                if not fake:
                    raise NotImplementedError("video codecs unavailable; see media_codec")
                # null duration arrives as NaN through Arrow (non-video
                # rows); NaN is truthy so `dur or 0` would crash int()
                dur_ms = int(dur) if pd.notna(dur) else 0
                n = max(dur_ms // every_ms, 1)
                raw = bytes(p) if p is not None else b""
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.sha256(raw + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def synthetic_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * 4
        mime = ["image/png", "audio/wav", "video/mp4"][i % 3]
        rows.append(
            (
                f"m{i:04d}", mime, payload,
                64 if mime.startswith("image") else None,
                64 if mime.startswith("image") else None,
                16000 if mime.startswith("audio") else None,
                3000 if mime.startswith("video") else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
