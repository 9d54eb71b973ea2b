"""Codec-path bench: pure-Python vs numpy-vectorized PNG/WAV feature
extraction (round-4 'What's wrong #1' fix) on a 10×-the-test-suite media
corpus, plus the end-to-end Spark mapInPandas wall time on the default
(numpy) executor path.

Media are deterministic synthetic payloads (same integer formulas as
multimodal.synthetic_real_media, scaled up): no external data.

Usage: python jobs/codec_bench.py [--items 60]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_media(items: int):
    from dug_spark.functions import codecs

    media = []
    for i in range(items):
        if i % 2 == 0:
            w, h = 320, 240
            px = [
                bytearray(
                    b
                    for x in range(w)
                    for b in ((x * 7 + i * 13 + 7) % 256, (y * 11 + i * 5) % 256,
                              (x * y + i) % 256)
                )
                for y in range(h)
            ]
            media.append(("image/png", codecs.encode_png(w, h, 3, px)))
        else:
            samples = [((t * (i + 3) + 7) % 2048 - 1024) * 16 for t in range(200_000)]
            media.append(("audio/wav", codecs.encode_wav(8000, 1, samples)))
    return media


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=60)
    args = ap.parse_args()

    from dug_spark.functions import codecs

    media = make_media(args.items)
    out = {"items": args.items, "png_px": "320x240x3", "wav_samples": 200_000}

    for label, un in [("pure_python", False), ("numpy", True)]:
        t0 = time.monotonic()
        feats = []
        for mime, payload in media:
            if mime == "image/png":
                feats.append(codecs.png_features(payload, use_numpy=un))
            else:
                feats.append(codecs.wav_features(payload, use_numpy=un))
        out[f"{label}_secs"] = round(time.monotonic() - t0, 2)
        out[f"{label}_last"] = [round(x, 6) for x in feats[-1][:4]]
    out["speedup"] = round(out["pure_python_secs"] / out["numpy_secs"], 1)

    # end-to-end through the Arrow mapInPandas plumbing (default = numpy)
    from pyspark.sql import Row

    from dug_spark.operators import multimodal
    from dug_spark.session import get_spark

    spark = get_spark("codec_bench", cores=8, shuffle_partitions=8)
    rows = [
        Row(
            media_id=f"b{i:04d}", mime=m, payload=bytes(p),
            width=320 if m.startswith("image") else None,
            height=240 if m.startswith("image") else None,
            sample_rate=8000 if m.startswith("audio") else None,
            duration_ms=None,
        )
        for i, (m, p) in enumerate(media)
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA).repartition(8)
    multimodal.extract_features(df).count()  # warm-up (workers, codegen)
    t0 = time.monotonic()
    n = multimodal.extract_features(df).count()
    out["spark_numpy_secs"] = round(time.monotonic() - t0, 2)
    out["spark_rows"] = n
    print(json.dumps(out))


if __name__ == "__main__":
    main()
