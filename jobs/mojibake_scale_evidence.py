"""fix_mojibake scale evidence: before/after for the round-5
vectorized pre-filter (VERDICT r4 "What's wrong #1").

Two 1.6M-doc corpora (5k x 320 replicas of the sf0.1 documents table):

- organic: ~3% of documents carry a mojibake marker ("cafÃ©" --
  UTF-8 bytes misdecoded as latin-1), the rest are pure ASCII.  The
  vectorized non-ASCII pre-filter skips the per-row codec round-trips on
  97% of rows -- the crawl-scale common case.
- adversarial/all-suspicious: EVERY document carries the marker, so the
  pre-filter flags everything and the per-row repair runs on all rows --
  this is (one C-level regex scan more than) the pre-round-5 cost, i.e.
  the "before" measurement.

Usage: python jobs/mojibake_scale_evidence.py [--replicate 320]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=320)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import textstats
    from dug_spark.session import get_spark

    spark = get_spark("mojibake_scale", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
            "text",
        )
    )
    out: dict = {"replicate": args.replicate, "docs": docs.count()}

    # mojibake marker: "café" written as UTF-8 then misdecoded as latin-1
    moji = F.lit(" cafÃ©")

    # warm the Python workers (fork + pandas import dominates a first
    # mapInPandas run and would skew whichever variant goes first)
    textstats.fix_mojibake(docs.limit(1000).localCheckpoint()).count()

    def run(tag: str, frame) -> None:
        frame = frame.localCheckpoint()  # time the operator, not the prep
        best = None
        for _ in range(2):  # two timed passes, keep the best (host noise)
            t0 = time.monotonic()
            agg = (
                textstats.fix_mojibake(frame)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum((F.col("mojibake_rounds") > 0).cast("long")).alias(
                        "n_repaired"
                    ),
                )
                .collect()[0]
            )
            secs = time.monotonic() - t0
            if best is None or secs < best:
                best = secs
        out[tag] = {
            "secs": round(best, 1),
            "docs_per_sec": round(int(agg["n"]) / best, 1),
            "n_repaired": int(agg["n_repaired"]),
        }

    # organic: doc_id % 32 == 0 (~3%) carries the marker
    run(
        "organic_3pct_suspicious",
        docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 32 == 0, F.concat("text", moji))
            .otherwise(F.col("text"))
            .alias("text"),
        ),
    )
    # all-suspicious == the pre-round-5 per-row cost ("before")
    run(
        "all_suspicious_before",
        docs.select("doc_id", F.concat("text", moji).alias("text")),
    )
    out["speedup_organic_vs_before"] = round(
        out["organic_3pct_suspicious"]["docs_per_sec"]
        / out["all_suspicious_before"]["docs_per_sec"],
        2,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
