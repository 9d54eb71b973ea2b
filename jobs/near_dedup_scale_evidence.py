"""near_dedup_corpus scale evidence: the composed end-state (minhash
pairs -> connected duplicate clusters -> keeper election -> one verdict
row per document) at 1.6M docs.

Corpus shape: 5k sf0.1 docs x 320 replicas where replica r of doc d
keeps the original text for r < group size g(d) = 2 + d % 4, else gets a
per-replica unique suffix sentence on every line.  So each source doc
yields ONE g(d)-member near-identical cluster (g in {2,3,4,5}) plus
(320 - g) singletons -- ~17.5k multi-doc clusters over 1.6M docs, with
transitive chains exercised by the within-cluster identity.  Records
cluster count, removal count (docs with keep=false), wall time, and the
max_bucket ledger shape.

Usage: python jobs/near_dedup_scale_evidence.py [--replicate 320] [--cap 100]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=320)
    ap.add_argument("--cap", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import dedup
    from dug_spark.session import get_spark

    spark = get_spark("near_dedup_scale", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    out: dict = {"replicate": args.replicate, "cap": args.cap}

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
            F.when(
                F.col("rep") < 2 + F.col("doc_id") % 4, F.col("text")
            )
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", "\n"),
                        lambda l: F.concat(
                            l,
                            F.lit(" u"),
                            F.col("rep").cast("string"),
                            F.lit("x"),
                            F.col("doc_id").cast("string"),
                        ),
                    ),
                    "\n",
                )
            )
            .alias("text"),
        )
        .localCheckpoint()
    )
    out["docs"] = docs.count()

    t0 = time.monotonic()
    verdicts = dedup.near_dedup_corpus(
        docs, threshold=0.9, max_bucket=args.cap
    )
    agg = verdicts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
        F.count_distinct(
            F.when(F.col("cluster_size") > 1, F.col("cluster_id"))
        ).alias("n_multi_clusters"),
        F.max("cluster_size").alias("max_cluster"),
    ).collect()[0]
    secs = time.monotonic() - t0
    out["run"] = {
        "secs": round(secs, 1),
        "docs_per_sec": round(int(agg["n"]) / secs, 1),
        "verdict_rows": int(agg["n"]),
        "n_removed": int(agg["n_removed"]),
        "n_multi_clusters": int(agg["n_multi_clusters"]),
        "max_cluster": int(agg["max_cluster"]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
