"""LM-family scale evidence: perplexity scoring and sequence packing at
10x the bench corpus (1.6M documents = 5k x 320 replicas).

Scoring is the op to stress: the bigram LM trains once on the UNREPLICATED
5k-doc reference slice (dimension-sized, as at crawl scale where the
trusted corpus does not grow with the crawl), then the map-only Arrow
scorer runs over 1.6M documents — throughput here is the number that
matters at 10^12 docs because the corpus side never shuffles.  Packing
shuffles once on the shard key; n_shards=1024 keeps shards ~1.6k docs.

Usage: python jobs/lm_scale_evidence.py [--replicate 320]
Prints one JSON line for BASELINE.md / SCALE.md.
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
    ap.add_argument("--n-shards", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark import fixtures
    from dug_spark.operators import lm
    from dug_spark.session import get_spark

    spark = get_spark("lm_scale", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    out: dict = {"replicate": args.replicate, "n_shards": args.n_shards}

    base = fixtures.webify_documents(
        spark.read.parquet(f"{SF}/documents.parquet").repartition(64)
    )
    ref = base.select("doc_id", "text")  # unreplicated trusted slice (5k)
    # organic replicas: per-replica suffix so the scored text is not a
    # clone of the training text (the realistic out-of-domain shape)
    docs = base.crossJoin(reps).select(
        (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
        F.concat_ws(
            " ", "text", F.concat(F.lit("replica"), F.col("rep"))
        ).alias("text"),
    )
    n_docs = docs.count()
    out["docs"] = n_docs

    # both model orders, same protocol: the round-5 keep-rate-stability
    # evidence is the bucket split of the pruned trigram tracking the
    # bigram's (head+middle ≈ the CCNet 2/3 keep rate)
    for label, kw in (("perplexity", {}), ("perplexity_tri", {"order": 3})):
        t0 = time.monotonic()
        scored = lm.perplexity_filter(docs, ref, **kw)
        agg = scored.groupBy("ppl_bucket").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("perplexity"), 2).alias("avg_ppl"),
        ).collect()
        secs = round(time.monotonic() - t0, 1)
        out[label] = {
            "secs": secs,
            "docs_per_sec": round(n_docs / secs, 1),
            "buckets": {r["ppl_bucket"]: [r["n"], r["avg_ppl"]] for r in agg},
        }
    _tables, ledger = lm.train_trigram_lm(ref)
    out["trigram_ledger"] = ledger

    t0 = time.monotonic()
    packed = lm.pack_sequences(docs, budget=2048, n_shards=args.n_shards)
    stats = packed.groupBy().agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("shard", "seq_id").alias("sequences"),
        F.sum(F.col("oversize").cast("int")).alias("oversize"),
        F.max("tok_offset").alias("max_offset"),
    ).collect()[0]
    secs = round(time.monotonic() - t0, 1)
    out["pack"] = {
        "secs": secs,
        "docs_per_sec": round(n_docs / secs, 1),
        "rows": stats["rows"],
        "sequences": stats["sequences"],
        "oversize": stats["oversize"],
        "max_offset": stats["max_offset"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
