"""Scale evidence for star-contraction connected components
(canonicalize.connected_components_star) vs min-label propagation.

The graph the canonicalization step sees at web scale is adversarial
for propagation: URL-redirect ladders and alias chains give the
equivalence graph long thin paths, and propagation's round count IS the
diameter.  Star contraction's round count is diameter-independent.

Evidence graph (deterministic column-op synthesis, no RNG):
- one 100k-hop chain (diameter 100k), plus
- 1.5M nodes in 300k five-node components (the typical short clusters).

Expected: propagation at its default budget (25 rounds) REFUSES the
chain by design (RuntimeError — returning non-fixpoint labels would
corrupt canonical ids); star contraction converges in a handful of
rounds and labels every chain node c000000.  On the short-cluster-only
subset both agree and both are cheap — the delta is the chain.

Usage: python jobs/cc_star_scale_evidence.py [--small]
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

    from dug_spark.operators import canonicalize
    from dug_spark.session import get_spark

    spark = get_spark("cc_star_scale", cores=32, shuffle_partitions=64)
    chain_n = 2_000 if args.small else 100_000
    clusters = 6_000 if args.small else 300_000
    out: dict = {"chain_hops": chain_n, "clusters": clusters}

    sid = F.col("id")
    chain = spark.range(chain_n).select(
        F.format_string("c%06d", sid).alias("src"),
        F.format_string("c%06d", sid + 1).alias("dst"),
    )
    # 5-node components r{k}_0..r{k}_4: edges j→j+1 within cluster k
    rng = spark.range(clusters * 4)
    small = rng.select(
        F.format_string("r%07d_%d", F.floor(sid / 4), sid % 4).alias("src"),
        F.format_string("r%07d_%d", F.floor(sid / 4), sid % 4 + 1).alias("dst"),
    )
    edges = chain.unionByName(small).localCheckpoint(eager=True)
    n_edges = edges.count()
    out["edges"] = n_edges

    t0 = time.time()
    stats: dict = {}
    labels = canonicalize.connected_components_star(
        edges, stats=stats
    ).localCheckpoint(eager=True)
    out["star_wall_s"] = round(time.time() - t0, 2)
    out["star_rounds"] = stats.get("rounds")
    out["n_components"] = labels.select("comp").distinct().count()
    out["components_expected"] = clusters + 1
    chain_ok = (
        labels.where(F.col("id").startswith("c"))
        .where(F.col("comp") != "c000000")
        .count()
    )
    out["chain_mislabeled"] = chain_ok

    # propagation on the same graph at its default budget: must refuse
    t0 = time.time()
    try:
        canonicalize.connected_components(
            edges.unionByName(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ),
            max_iter=25,
        )
        out["propagation_default"] = "converged (unexpected)"
    except RuntimeError:
        out["propagation_default"] = "refused: chain diameter > 25 rounds"
    out["propagation_probe_wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
