"""PageRank scale evidence: a deterministic hash graph at 1.6M nodes /
16M edges (10 out-edges per node, dst = xxhash64(src, i) mod N — no RNG,
resume-safe), run through both join strategies:

- broadcast_ranks=True: the 1.6M-row rank table broadcasts (~tens of MB)
  and the edge side never shuffles — the shape for dimension-sized node
  sets (concepts, hosts).
- broadcast_ranks=False: plain shuffle join — the shape for node sets
  beyond broadcast (page-level graphs).

Usage: python jobs/graph_scale_evidence.py [--nodes 1600000] [--deg 10]
Prints one JSON line for BASELINE.md / SCALE.md.
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
    ap.add_argument("--nodes", type=int, default=1_600_000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--iterations", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import graph
    from dug_spark.session import get_spark

    spark = get_spark("graph_scale", cores=32, shuffle_partitions=64)
    n = args.nodes
    src = spark.range(n).select(F.col("id").alias("src"))
    edges = (
        src.crossJoin(spark.range(args.deg).select(F.col("id").alias("i")))
        .select(
            "src",
            (F.abs(F.xxhash64("src", "i")) % n).alias("dst"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)  # fixed edge input for both runs
    )
    out: dict = {
        "nodes": n,
        "edges": edges.count(),
        "iterations": args.iterations,
    }

    for label, bcast in (("broadcast", True), ("shuffle", False)):
        t0 = time.monotonic()
        pr = graph.pagerank(
            edges, iterations=args.iterations, broadcast_ranks=bcast
        )
        stats = pr.agg(
            F.round(F.sum("rank"), 6).alias("mass"),
            F.round(F.max("rank") * n, 2).alias("max_rel"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        secs = round(time.monotonic() - t0, 1)
        out[label] = {
            "secs": secs,
            "secs_per_iter": round(secs / args.iterations, 2),
            "rank_mass": stats["mass"],
            "max_rank_over_uniform": stats["max_rel"],
            "ranked_nodes": stats["n"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
