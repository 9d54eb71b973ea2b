"""Scale evidence for winnowing fingerprints + MOSS overlap
(dedup.winnow_fingerprints / winnow_overlap) at ~10^6 docs.

Corpus: 1.6M synthetic docs of 40 tokens (column-op synthesis, no RNG);
every odd doc is its predecessor with one token substituted mid-run —
a planted near-duplicate that exact dedup misses but the ≥ k+w−1
shared-run guarantee must catch.  Unique token prefixes keep unrelated
docs from sharing shingles, so the pair report is exactly the planted
pairs — found/expected is a correctness count at scale, not a sample.

Fingerprinting is the corpus-scale pass (zero-shuffle map + explode:
docs/s is the number that matters at 10^12); the overlap join runs on
the fingerprint table with the max_df stop-fingerprint guard bounding
the self-join.

Usage: python jobs/winnow_scale_evidence.py [--small]
Prints one JSON line for BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, W = 5, 4
TOKENS = 40


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import dedup
    from dug_spark.session import get_spark

    spark = get_spark("winnow_scale", cores=32, shuffle_partitions=64)
    n = 40_000 if args.small else 1_600_000
    out: dict = {"docs": n, "k": K, "window": W, "tokens_per_doc": TOKENS}

    pair = F.floor(F.col("id") / 2)
    is_var = F.col("id") % 2 == 1
    words = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda t: F.concat(F.lit("w"), pair.cast("string"), F.lit("_"), t.cast("string")),
    )
    # variant: token 20 swapped — leaves shared runs ≥ k+w-1 both sides
    mutated = F.when(
        is_var,
        F.transform(
            words,
            lambda x, i: F.when(i == 20, F.concat(x, F.lit("X"))).otherwise(x),
        ),
    ).otherwise(words)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(mutated, " ").alias("text"),
    ).localCheckpoint(eager=True)

    t0 = time.time()
    fps = dedup.winnow_fingerprints(docs, k=K, window=W).localCheckpoint(
        eager=True
    )
    wall = time.time() - t0
    out["fingerprint_wall_s"] = round(wall, 2)
    out["docs_per_s"] = int(n / wall)
    out["fingerprints"] = fps.count()
    out["fp_per_doc"] = round(out["fingerprints"] / n, 2)

    t0 = time.time()
    pairs = dedup.winnow_overlap(fps, min_shared=2, max_df=8).localCheckpoint(
        eager=True
    )
    out["overlap_wall_s"] = round(time.time() - t0, 2)
    out["pairs_found"] = pairs.count()
    out["pairs_expected"] = n // 2
    planted = pairs.where(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % 2 == 0)
    ).count()
    out["planted_found"] = planted
    print(json.dumps(out))


if __name__ == "__main__":
    main()
