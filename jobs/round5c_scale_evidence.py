"""Scale evidence for the round-5 continuation batch: crawl churn,
k-core, product quantization, random walks — each at ~1.6M input rows
on deterministic synthetic data (no RNG, resume-safe).

- crawl churn: 1.6M captures over 100k urls (16 captures each, content
  version flipping on a deterministic schedule) → per-url churn rows.
  One url-keyed shuffle (window + agg share the partitioning).
- k-core: hash graph at 400k nodes / 4M directed edges, k=8 peel to the
  fixpoint — exercises several cascade rounds of degree agg + anti-join.
- PQ: 1.6M synthetic 64-dim vectors, pq_train (1 Lloyd round) +
  pq_encode + IVF-ADC top-5 for 1k queries.
- walks: the same 400k-node graph, 1 walk × 4 steps per node →
  frontier-only shuffles per step.

Usage: python jobs/round5c_scale_evidence.py [--rows 1600000]
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
    ap.add_argument("--rows", type=int, default=1_600_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import crawl, graph, similarity
    from dug_spark.session import get_spark

    spark = get_spark("round5c_scale", cores=32, shuffle_partitions=64)
    n = args.rows
    out: dict = {"rows": n}

    # --- crawl churn: n captures over n/16 urls --------------------------
    urls = n // 16
    caps = spark.range(n).select(
        F.concat(F.lit("https://u"), (F.col("id") % urls).cast("string"), F.lit(".example.org/p")).alias("url"),
        F.timestamp_seconds(F.lit(1600000000) + F.col("id")).alias("warc_ts"),
        F.concat(
            F.lit("v"),
            F.when(((F.col("id") / urls).cast("long") % 4).isin(0, 1), F.lit(0))
            .otherwise((F.col("id") / urls).cast("long") % 4)
            .cast("string"),
        ).alias("text"),
    )
    t0 = time.monotonic()
    churn = crawl.snapshot_churn(caps)
    agg = churn.agg(
        F.count(F.lit(1)).alias("urls"),
        F.sum("n_changes").alias("changes"),
        F.round(F.avg("change_ratio"), 4).alias("mean_ratio"),
    ).collect()[0]
    wall = round(time.monotonic() - t0, 1)
    out["churn"] = {
        "captures": n,
        "urls": int(agg["urls"]),
        "changes": int(agg["changes"]),
        "mean_ratio": float(agg["mean_ratio"]),
        "wall_s": wall,
        "captures_per_s": round(n / wall),
    }

    # --- shared hash graph: 400k nodes, heterogeneous out-degree 1..20 ---
    # (degree variance is what makes the peel cascade across rounds)
    gn = max(n // 4, 1000)
    edges = (
        spark.range(gn)
        .select(F.col("id").alias("src"))
        .crossJoin(spark.range(20).select(F.col("id").alias("i")))
        .where(F.col("i") <= F.col("src") % 20)
        .select(
            F.col("src").cast("string").alias("src"),
            (F.abs(F.xxhash64("src", "i")) % gn).cast("string").alias("dst"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()

    t0 = time.monotonic()
    core = graph.k_core(edges, k=12, broadcast_removed=True)
    core_stats = core.agg(
        F.count(F.lit(1)).alias("nodes"), F.min("degree").alias("min_deg")
    ).collect()[0]
    wall = round(time.monotonic() - t0, 1)
    out["kcore"] = {
        "graph_nodes": gn,
        "graph_edges": n_edges,
        "k": 12,
        "core_nodes": int(core_stats["nodes"]),
        "core_min_degree": int(core_stats["min_deg"]) if core_stats["min_deg"] is not None else None,
        "wall_s": wall,
    }

    t0 = time.monotonic()
    walks = graph.random_walks(edges, walk_length=4, walks_per_node=1)
    wstats = walks.agg(
        F.count(F.lit(1)).alias("walks"), F.round(F.avg("steps"), 3).alias("mean_steps")
    ).collect()[0]
    wall = round(time.monotonic() - t0, 1)
    out["walks"] = {
        "walks": int(wstats["walks"]),
        "mean_steps": float(wstats["mean_steps"]),
        "wall_s": wall,
        "hops_per_s": round(int(wstats["walks"]) * float(wstats["mean_steps"]) / wall),
    }

    # --- PQ: 1.6M 64-dim vectors, train + encode + IVF-ADC ---------------
    dim = 64
    vecs = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d), F.lit(1000)) / 500.0 - 1.0
                ),
            ).alias("embedding"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    k_cells = 64  # ~sqrt(n)-scale cell count: 1.6M/64 = 25k-vector lists
    t0 = time.monotonic()
    _, cents = similarity.ivf_train_assign(vecs, k_cells, iters=1)
    cbs = similarity.pq_train(vecs, m=8, ksub=16, iters=1)
    t_train = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    # force materialization of the code column (a bare count() would let
    # Catalyst prune the encode projection away entirely)
    enc_rows = (
        similarity.pq_encode(vecs, cbs)
        .agg(F.sum(F.size("code"))).collect()[0][0] // len(cbs)
    )
    t_encode = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    q = vecs.where(F.col("vec_id") < 1000)
    # serving shape: reuse the trained quantizers
    topk = similarity.pq_ivf_topk(
        q, vecs, k=5, k_cells=k_cells, m=8, ksub=16, cents=cents, codebooks=cbs
    ).count()
    t_search = round(time.monotonic() - t0, 1)
    out["pq"] = {
        "vectors": n,
        "dim": dim,
        "train_wall_s": t_train,
        "encode_wall_s": t_encode,
        "encode_vecs_per_s": round(enc_rows / t_encode) if t_encode else None,
        "search_queries": 1000,
        "search_rows": topk,
        "search_wall_s": t_search,
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
