"""BGP / k-hop / triple-validity scale evidence at ~1.6M triples.

Synthesizes a deterministic skewed triple table in the pipeline's output
shape — 200k docs x 7 HAS_CONCEPT mentions (concept popularity follows a
quadratic skew: concept ids cluster toward 0, the hot-head shape
plans/skew.py salts for), a 1k-node subclass chain, and a co-mention ring
— then times:

- the 4-pattern kg_bgp star+chain query (match_bgp) over the full table,
- bounded_reachability k=3 from 100 seed concepts,
- triple_validity over the HAS_CONCEPT slice replicated across 8 crawl
  snapshots with bit-pattern presence (~1.6M additional observations).

Prints one JSON line for BASELINE.md.  Usage:
    python jobs/bgp_scale_evidence.py [--docs 200000 --mentions 7]
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
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--mentions", type=int, default=7)
    ap.add_argument("--concepts", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import bgp, crawl
    from dug_spark.session import get_spark

    spark = get_spark("bgp_scale", cores=args.cores, shuffle_partitions=args.cores)
    C = args.concepts

    docs = spark.range(args.docs)
    m = spark.range(args.mentions).withColumnRenamed("id", "m")
    # quadratic skew: concept = floor(((id*31+m) % C)^2 / C) piles mass on
    # low ids — doc 0's share of concept 0 mirrors a hot UMLS term
    raw = (F.col("id") * 31 + F.col("m")) % C
    has = (
        docs.crossJoin(m)
        .select(
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("subj"),
            F.lit("HAS_CONCEPT").alias("pred"),
            F.concat(
                F.lit("c"), F.floor(raw * raw / C).cast("string")
            ).alias("obj"),
        )
        .dropDuplicates(["subj", "obj"])
    )
    cids = spark.range(C)
    sub = cids.where(F.col("id") >= 1).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("subj"),
        F.lit("biolink:subclass_of").alias("pred"),
        F.concat(F.lit("c"), (F.col("id") / 2).cast("long").cast("string")).alias(
            "obj"
        ),
    )
    com = cids.select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("subj"),
        F.lit("co_mentioned_with").alias("pred"),
        F.concat(F.lit("c"), ((F.col("id") * 7 + 1) % C).cast("string")).alias("obj"),
    )
    t = has.unionByName(sub).unionByName(com)
    t.write.mode("overwrite").parquet("/dev/shm/bgp_scale/t")
    t = spark.read.parquet("/dev/shm/bgp_scale/t")
    n_triples = t.count()

    t0 = time.monotonic()
    n_bgp = bgp.match_bgp(
        t,
        [
            ("?doc", "HAS_CONCEPT", "?c"),
            ("?c", "biolink:subclass_of", "?parent"),
            ("?doc", "HAS_CONCEPT", "?c2"),
            ("?c", "co_mentioned_with", "?c2"),
        ],
    ).count()
    bgp_wall = time.monotonic() - t0

    seeds = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") * 9).cast("string")).alias("seed")
    )
    edges = t.where(F.col("pred") != "HAS_CONCEPT").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    t0 = time.monotonic()
    n_khop = bgp.bounded_reachability(edges, seeds, 3).count()
    khop_wall = time.monotonic() - t0

    # 8-snapshot observation log: presence = bit s of a per-triple hash
    snaps = spark.range(8).withColumnRenamed("id", "s")
    h = F.abs(F.xxhash64("subj", "obj"))
    obs = (
        t.where(F.col("pred") == "HAS_CONCEPT")
        .crossJoin(snaps)
        .where(
            F.element_at(
                F.array(*[(h.bitwiseAND(F.lit(1 << b)) != 0) for b in range(8)]),
                (F.col("s") + 1).cast("int"),
            )
        )
        .select(
            "subj",
            "pred",
            "obj",
            F.timestamp_seconds(F.lit(1600000000) + F.col("s") * 86400).alias(
                "warc_ts"
            ),
        )
    )
    t0 = time.monotonic()
    n_intervals = crawl.triple_validity(obs).count()
    validity_wall = time.monotonic() - t0
    n_obs = obs.count()

    import shutil

    shutil.rmtree("/dev/shm/bgp_scale", ignore_errors=True)
    print(
        json.dumps(
            {
                "triples": n_triples,
                "bgp_rows": n_bgp,
                "bgp_wall_s": round(bgp_wall, 2),
                "bgp_triples_per_sec": round(n_triples / bgp_wall, 1),
                "khop_rows": n_khop,
                "khop_wall_s": round(khop_wall, 2),
                "validity_obs": n_obs,
                "validity_intervals": n_intervals,
                "validity_wall_s": round(validity_wall, 2),
                "cores": args.cores,
            }
        )
    )


if __name__ == "__main__":
    main()
