"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not in the reference (Dug's `type` mentions "image" as a study modality
only); required for a training-data pipeline over mixed-modality corpora.

Design: media travel as ``binary`` columns with a typed metadata struct
(mime, width/height or sample-rate, duration).  Per-item work (decode,
feature-extract, resize, frame-sample) runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, partition preservation,
batch shape) is real and tested.

Codec status (round 3): image/png and audio/wav decode are REAL —
pure-stdlib codecs written from the public specs
(dug_spark/functions/codecs.py: zlib+struct PNG with all five scanline
filters; wave-module 16-bit PCM).  Only video decode remains stubbed
(no container codec CAN decode mp4 from stdlib): it raises
``NotImplementedError`` unless ``deterministic_fake=True``.  The
``deterministic_fake=True`` mode is retained for all mimes as the
seeded, content-derived fake used by the cross-engine oracle tables.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from dug_spark.functions import codecs

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
    """The decode boundary.  PNG and WAV decode for real via the
    from-spec stdlib codecs; video (no stdlib decoder exists) raises
    unless ``deterministic_fake=True``.  The fake mode is kept for every
    mime — it is what the cross-engine oracle tables pin down."""
    if deterministic_fake:
        # content-derived fake: stable 16-dim feature from the payload digest
        digest = hashlib.sha256(payload or b"").digest()
        return [b / 255.0 for b in digest[:16]]
    if mime == "image/png":
        return codecs.png_features(payload or b"")
    if mime == "audio/wav":
        return codecs.wav_features(payload or b"")
    raise NotImplementedError(
        f"no stdlib decoder for {mime}; video needs pyav/ffmpeg — pass "
        "deterministic_fake=True for the seeded stub"
    )


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
    """Image resize inside the batch loop: REAL for PNG (decode →
    nearest-neighbour resample → re-encode, all from-spec stdlib);
    ``deterministic_fake=True`` keeps the seeded digest stub used by the
    oracle tables.  Non-PNG **image** mimes raise NotImplementedError
    (same contract as media_codec — a caller asking to resize image/jpeg
    must not silently get the original bytes back); audio/video rows pass
    through untouched with their original width/height."""
    fake = deterministic_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, ws, hs = [], [], []
            for p, m, w_in, h_in in zip(
                pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]
            ):
                raw = bytes(p) if p is not None else b""
                if fake:
                    out.append(
                        hashlib.sha256(raw + f"{width}x{height}".encode()).digest()
                    )
                    ws.append(width)
                    hs.append(height)
                elif m == "image/png":
                    w0, h0, ch, rows = codecs.decode_png(raw)
                    resized = codecs.resize_nearest(w0, h0, ch, rows, width, height)
                    out.append(codecs.encode_png(width, height, ch, resized))
                    ws.append(width)
                    hs.append(height)
                elif m is not None and m.startswith("image/"):
                    raise NotImplementedError(
                        f"no stdlib decoder for {m}; only image/png resizes for "
                        "real — pass deterministic_fake=True for the seeded stub"
                    )
                else:
                    # non-image: pass through with dims untouched (null-safe:
                    # Arrow delivers null ints as NaN)
                    out.append(raw)
                    ws.append(int(w_in) if pd.notna(w_in) else None)
                    hs.append(int(h_in) if pd.notna(h_in) else None)
            res = pdf.copy()
            res["payload"] = pd.Series(out, dtype="object")
            res["width"] = pd.Series(ws, dtype="object")
            res["height"] = pd.Series(hs, dtype="object")
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


def synthetic_real_media(spark, n: int = 12, seed: int = 7) -> DataFrame:
    """Deterministic VALID media: real PNG images (patterned RGB pixels)
    and real 16-bit PCM WAV clips, generated from integer formulas — no
    external data, decodable by the from-spec codecs."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 24, 16
            px = [
                bytearray(
                    b
                    for x in range(w)
                    for b in (
                        (x * 7 + i * 13 + seed) % 256,
                        (y * 11 + i * 5) % 256,
                        (x * y + i) % 256,
                    )
                )
                for y in range(h)
            ]
            payload = codecs.encode_png(w, h, 3, px)
            rows.append((f"r{i:04d}", "image/png", payload, w, h, None, None))
        else:
            samples = [((t * (i + 3) + seed) % 2048 - 1024) * 16 for t in range(400)]
            payload = codecs.encode_wav(8000, 1, samples)
            rows.append((f"r{i:04d}", "audio/wav", payload, None, None, 8000, 50))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


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
