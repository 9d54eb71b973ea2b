"""Scale evidence for warm-start PageRank (graph.pagerank init_ranks) —
the recrawl-increment path: a crawl update perturbs the link graph by
~1%, and restarting from the previous materialization's ranks should
reach the new fixed point in far fewer iterations than a uniform cold
start (power iteration converges as d^k from the INITIAL error).

Setup: 400k-node / 4M-edge deterministic hash graph; "previous crawl" =
20 cold iterations on G; "increment" = +1% new edges → G'.  Truth = 30
cold iterations on G'.  Report L1 distance to truth after k ∈ {2, 4}
iterations, warm vs cold, plus the iteration counts each path needs to
reach L1 ≤ 1e-4.

Usage: python jobs/warm_pagerank_scale_evidence.py [--small]
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

    from dug_spark.operators.graph import pagerank
    from dug_spark.session import get_spark

    spark = get_spark("warm_pr_scale", cores=32, shuffle_partitions=64)
    n = 40_000 if args.small else 400_000
    deg = 10
    bcast = bool(args.small)

    # 30% of edges point into a 1k-node hub set: the rank vector is FAR
    # from uniform (a near-regular graph's fixed point ≈ the uniform
    # cold start, which would hide the warm-start advantage)
    h = F.abs(F.xxhash64("id", "i"))
    base_edges = (
        spark.range(n)
        .crossJoin(spark.range(deg).select(F.col("id").alias("i")))
        .select(
            F.col("id").alias("src"),
            F.when(F.col("i") < 3, h % 1_000).otherwise(h % n).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    # +1% new edges = the crawl increment
    delta = (
        spark.range(n * deg // 100)
        .select(
            (F.abs(F.xxhash64("id", F.lit("a"))) % n).alias("src"),
            (F.abs(F.xxhash64("id", F.lit("b"))) % n).alias("dst"),
        )
    )
    new_edges = base_edges.unionByName(delta).localCheckpoint(eager=True)

    prev = pagerank(
        base_edges, iterations=20, broadcast_ranks=bcast
    ).localCheckpoint(eager=True)
    truth = pagerank(
        new_edges, iterations=30, broadcast_ranks=bcast
    ).localCheckpoint(eager=True)

    def l1(df):
        return (
            df.withColumnRenamed("rank", "r")
            .join(truth, "node")
            .agg(F.sum(F.abs(F.col("r") - F.col("rank"))))
            .collect()[0][0]
        )

    out: dict = {"nodes": n, "edges": new_edges.count()}
    for k in (2, 4):
        t0 = time.time()
        out[f"warm_l1_at_{k}"] = round(
            l1(
                pagerank(
                    new_edges, iterations=k, broadcast_ranks=bcast,
                    init_ranks=prev,
                )
            ),
            8,
        )
        out[f"warm_wall_{k}"] = round(time.time() - t0, 2)
        out[f"cold_l1_at_{k}"] = round(
            l1(pagerank(new_edges, iterations=k, broadcast_ranks=bcast)), 8
        )
    # iterations to reach L1 <= 1e-4 (bounded search)
    for label, init in (("warm", prev), ("cold", None)):
        iters = None
        for k in range(1, 21):
            if (
                l1(
                    pagerank(
                        new_edges, iterations=k, broadcast_ranks=bcast,
                        init_ranks=init,
                    )
                )
                <= 1e-4
            ):
                iters = k
                break
        out[f"{label}_iters_to_1e-4"] = iters
    print(json.dumps(out))


if __name__ == "__main__":
    main()
