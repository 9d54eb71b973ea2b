"""Scale evidence for personalized PageRank and sampled-source
betweenness at 1.6M nodes / 16M edges (same deterministic hash graph as
graph_scale_evidence.py — no RNG, resume-safe).

- personalized_pagerank: 5 iterations, 10 seeds, shuffle-join mode (the
  beyond-broadcast regime pagerank's crossover guidance names at this
  node count); reports wall/iteration and the seed-mass concentration
  (Σ rank over seed nodes — PPR's localization signature vs uniform
  PageRank's 10/1.6M).
- betweenness: 4 sampled sources, depth-capped; reports forward depth
  reached, (seed, node) state rows, and total wall — each round's state
  is seeds×reached, never edge-sized.

Usage: python jobs/centrality_scale_evidence.py [--small]
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
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import graph
    from dug_spark.session import get_spark

    spark = get_spark("centrality_scale", cores=32, shuffle_partitions=64)
    n = 160_000 if args.small else 1_600_000
    deg = 10
    edges = (
        spark.range(n)
        .crossJoin(spark.range(deg).select(F.col("id").alias("i")))
        .select(
            F.col("id").alias("src"),
            (F.abs(F.xxhash64("id", "i")) % n).alias("dst"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    out: dict = {"nodes": n, "edges": edges.count()}

    # ---------------- personalized PageRank ------------------------------
    seeds = spark.range(10).select(
        (F.col("id") * 7).alias("node"), F.lit(1.0).alias("weight")
    )
    iters = 5
    t0 = time.monotonic()
    ppr = graph.personalized_pagerank(
        edges, seeds, iterations=iters, broadcast_ranks=False
    )
    seed_mass = (
        ppr.join(seeds.select("node"), "node", "left_semi")
        .agg(F.sum("rank"))
        .collect()[0][0]
    )
    out["ppr_iterations"] = iters
    out["ppr_s"] = round(time.monotonic() - t0, 2)
    out["ppr_s_per_iter"] = round(out["ppr_s"] / iters, 2)
    out["ppr_seed_mass"] = round(float(seed_mass), 4)

    # ---------------- betweenness ----------------------------------------
    bseeds = spark.range(4).select((F.col("id") * 13).alias("seed"))
    t0 = time.monotonic()
    bc = graph.betweenness(edges, bseeds, max_depth=8)
    stats = bc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("betweenness") > 0, 1).otherwise(0)).alias("brokers"),
        F.max("betweenness").alias("max_bc"),
    ).collect()[0]
    out["bc_seeds"] = 4
    out["bc_max_depth"] = 8
    out["bc_scored_nodes"] = stats["n"]
    out["bc_brokers"] = int(stats["brokers"])
    out["bc_max"] = round(float(stats["max_bc"]), 2)
    out["bc_s"] = round(time.monotonic() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
