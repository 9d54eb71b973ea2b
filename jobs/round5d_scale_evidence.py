"""Scale evidence for the round-5 (cont. 4) operators — link prediction,
weighted shortest paths, SHACL-lite triple validation — at ~10^6-row
scale on a deterministic hash graph / triple table (no RNG, resume-safe).

- link_prediction: 400k-node, ~4M-edge graph with a planted hub (one
  node adjacent to 50k others — the web-scale quadratic hazard).  Run
  capped (max_degree) vs uncapped wedge middles and report wedge counts
  + wall: the cap is the difference between arboricity-shaped work and
  deg² blowup.
- shortest_paths: 1.6M-node / 16M-edge graph, 20 seeds, 6 rounds —
  frontier-driven Bellman-Ford; reports reached rows and wall/round.
- validate_triples: 10M-triple synthetic table with a constraint set
  flagging ~1% violations; one broadcast join + one (subj,pred) agg.

Usage: python jobs/round5d_scale_evidence.py [--small]
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
    ap.add_argument("--small", action="store_true", help="CI-sized smoke run")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import graph, validate
    from dug_spark.session import get_spark

    spark = get_spark("round5d_scale", cores=32, shuffle_partitions=64)
    out: dict = {}

    # ---------------- link prediction with a planted hub ----------------
    n = 40_000 if args.small else 400_000
    deg = 10
    hub_deg = n // 8  # the quadratic hazard: deg² wedges through one node
    base = (
        spark.range(n)
        .crossJoin(spark.range(deg).select(F.col("id").alias("i")))
        .select(
            F.col("id").alias("src"),
            (F.abs(F.xxhash64("id", "i")) % n).alias("dst"),
        )
    )
    hub = spark.range(hub_deg).select(
        F.lit(n).alias("src"), F.col("id").alias("dst")
    )
    edges = base.unionByName(hub).localCheckpoint(eager=True)
    out["lp_nodes"] = n + 1
    out["lp_edges"] = edges.count()
    out["lp_hub_degree"] = hub_deg

    t0 = time.monotonic()
    capped = graph.link_prediction(edges, max_degree=1000)
    out["lp_capped_pairs"] = capped.count()
    out["lp_capped_s"] = round(time.monotonic() - t0, 2)
    # uncapped would generate hub_deg²/2 ≈ {2.5e9 at 50k} wedges through
    # the hub alone — report the wedge-count ledger instead of running it
    adj_sizes = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = adj_sizes.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"),
        F.sum(
            F.when(F.col("d") <= 1000, F.col("d") * (F.col("d") - 1) / 2)
            .otherwise(0)
        ).alias("w_capped"),
        F.sum(F.when(F.col("d") > 1000, 1).otherwise(0)).alias("hubs_dropped"),
    ).collect()[0]
    out["lp_wedges_uncapped"] = int(wedges["w"])
    out["lp_wedges_capped"] = int(wedges["w_capped"])
    out["lp_hubs_dropped"] = int(wedges["hubs_dropped"])

    # ---------------- weighted shortest paths ---------------------------
    n2 = 160_000 if args.small else 1_600_000
    deg2 = 10
    e2 = (
        spark.range(n2)
        .crossJoin(spark.range(deg2).select(F.col("id").alias("i")))
        .select(
            F.col("id").alias("src"),
            (F.abs(F.xxhash64("id", "i")) % n2).alias("dst"),
            (1.0 + (F.abs(F.xxhash64("id", "i", F.lit(7))) % 9)).alias("weight"),
        )
        .localCheckpoint(eager=True)
    )
    seeds = spark.range(20).select(F.col("id").alias("seed"))
    rounds = 6
    t0 = time.monotonic()
    sp = graph.shortest_paths(e2, seeds, iterations=rounds)
    out["sssp_nodes"] = n2
    out["sssp_edges"] = e2.count()
    out["sssp_seeds"] = 20
    out["sssp_rounds"] = rounds
    out["sssp_reached"] = sp.count()
    out["sssp_s"] = round(time.monotonic() - t0, 2)

    # ---------------- triple validation ---------------------------------
    n3 = 1_000_000 if args.small else 10_000_000
    t = spark.range(n3).select(
        F.concat(F.lit("doc:"), (F.col("id") % (n3 // 4)).cast("string")).alias(
            "subj"
        ),
        F.when(F.col("id") % 100 == 0, F.lit("MENTIONS"))
        .otherwise(F.lit("HAS_CONCEPT"))
        .alias("pred"),
        F.concat(
            F.when(F.col("id") % 97 == 0, F.lit("BAD")).otherwise(F.lit("OP")),
            F.lit(":"),
            (F.abs(F.xxhash64("id")) % 50_000).cast("string"),
        ).alias("obj"),
    )
    # max_out=3 with ~4 distinct objects per subject exercises the
    # cardinality family at scale, not just domain/range/unknown
    constraints = spark.createDataFrame(
        [("HAS_CONCEPT", "doc", "OP", 3)],
        "pred string, domain_prefix string, range_prefix string, max_out int",
    )
    t0 = time.monotonic()
    v = validate.validate_triples(t, constraints)
    counts = {
        r["violation"]: r["n"]
        for r in v.groupBy("violation").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out["val_triples"] = n3
    out["val_violations"] = counts
    out["val_s"] = round(time.monotonic() - t0, 2)
    out["val_triples_per_s"] = int(n3 / max(out["val_s"], 0.01))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
