"""Phase decomposition for the scaling gate: time job A (annotate scan →
eager doc_concept_sets checkpoint, executed inside pipe.run()) and job B
(triple union + count) separately at one core count.

Usage: python jobs/scaling_probe.py --cores 8 --replicate 384 --runs 3
Prints one JSON line with per-run (run_secs, count_secs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=384)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import bench
    from dug_spark.session import get_spark

    spark = get_spark(
        f"probe_{args.cores}", cores=args.cores, shuffle_partitions=args.cores * 4
    )
    corpus = bench._corpus(spark, bench.SF_DIR, args.replicate)
    n = corpus.count()
    pipe = bench._pipeline(spark, realistic=True)
    warm = bench._corpus(spark, bench.SF_DIR, max(args.replicate // 96, 2))
    pipe.run(warm).triples.count()
    phases = []
    for _ in range(args.runs):
        t0 = time.monotonic()
        res = pipe.run(corpus)
        t1 = time.monotonic()
        res.triples.count()
        t2 = time.monotonic()
        phases.append({"run_secs": round(t1 - t0, 2), "count_secs": round(t2 - t1, 2)})
    print(json.dumps({"cores": args.cores, "docs": n, "phases": phases}))


if __name__ == "__main__":
    main()
