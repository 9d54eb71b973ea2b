"""Scale evidence for the membership/incremental layer:

1. Bloom filter (sketch.bloom_build/bloom_probe): build over ~1M URL
   keys, probe an ~8.7M-row stream — probe timed on BOTH paths (JVM
   array-literal vs numpy pandas UDF) against the exact broadcast LEFT
   SEMI alternative, plus the size argument: the dense filter is
   m/8 bytes (256 KiB at 2^21 bits) where the raw key set is tens of MB.
2. Incremental MinHash (dedup.minhash_incremental): a 320k-doc new
   batch against a 1.28M-doc signature store vs re-running the one-shot
   batch LSH on the full 1.6M — the claim is the increment only pays
   for the new batch's shingle pass plus store-sized joins.

Usage: python jobs/membership_scale_evidence.py [--replicate 320]
Prints one JSON line per section for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=320)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.session import get_spark
    from dug_spark.operators import dedup
    from dug_spark.operators.sketch import bloom_build, bloom_probe, bloom_words

    spark = get_spark("membership_scale", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
            "text",
        )
        .localCheckpoint()
    )
    n_docs = docs.count()

    # --- 1. Bloom vs broadcast LEFT SEMI ---------------------------------
    NB, K = 1 << 23, 5  # ~10 bits/key at 800k keys -> ~1% FP
    keys = docs.where(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 997).cast("string"),
                 F.lit(".example.org/d"), F.col("doc_id").cast("string")).alias("k")
    ).localCheckpoint()
    n_keys = keys.count()
    # probe: the even half regenerates BUILD keys exactly (true members);
    # the odd half makes disjoint keys (host formula offset) -> true negatives
    probe = docs.select(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("https://h"), (F.col("doc_id") % 997).cast("string"),
                     F.lit(".example.org/d"), F.col("doc_id").cast("string")),
        ).otherwise(
            F.concat(F.lit("https://x"), (F.col("doc_id") % 997).cast("string"),
                     F.lit(".example.org/d"), F.col("doc_id").cast("string")),
        ).alias("k")
    ).localCheckpoint()
    n_probe = probe.count()

    t0 = time.monotonic()
    words = bloom_words(bloom_build(keys, "k", NB, K), NB)
    t_build = time.monotonic() - t0

    t0 = time.monotonic()
    n_jvm = bloom_probe(probe, "k", words, NB, K, use_pandas=False).where(
        "might_contain"
    ).count()
    t_jvm = time.monotonic() - t0
    t0 = time.monotonic()
    n_pd = bloom_probe(probe, "k", words, NB, K, use_pandas=True).where(
        "might_contain"
    ).count()
    t_pd = time.monotonic() - t0
    t0 = time.monotonic()
    n_semi = probe.join(F.broadcast(keys), "k", "left_semi").count()
    t_semi = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "bloom_filter",
                "build_keys": n_keys,
                "probe_rows": n_probe,
                "num_bits": NB,
                "k": K,
                "filter_bytes": NB // 8,
                "secs_build": round(t_build, 1),
                "hits_jvm": n_jvm,
                "hits_pandas": n_pd,
                "paths_equal": n_jvm == n_pd,
                "exact_hits": n_semi,
                "false_positives": n_jvm - n_semi,
                "fp_rate": round((n_jvm - n_semi) / max(1, n_probe - n_semi), 6),
                "no_false_negatives": n_jvm >= n_semi,
                "secs_probe_jvm": round(t_jvm, 1),
                "secs_probe_pandas": round(t_pd, 1),
                "secs_broadcast_semi": round(t_semi, 1),
            }
        ),
        flush=True,
    )

    # --- 2. incremental MinHash vs one-shot batch -------------------------
    # Two regimes: the raw replicated corpus is ADVERSARIALLY clone-heavy
    # (every doc is a replicate-sized near-dup cluster — match volume
    # dominates both runs), so a second, decorated corpus appends 8
    # doc-unique tokens to push replica Jaccard well under the threshold
    # and measure the MACHINERY cost (signatures + bands + store joins)
    # that the incremental path actually saves.
    uniq = F.concat(
        "text",
        *[
            F.concat(F.lit(f" {c}"), F.col("doc_id").cast("string"))
            for c in "uvwxyzab"
        ],
    )
    docs = docs.select("doc_id", uniq.alias("text")).localCheckpoint()
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    t0 = time.monotonic()
    store = dedup.minhash_signatures(old).localCheckpoint()
    t_store = time.monotonic() - t0
    n_old, n_new = old.count(), new.count()
    t0 = time.monotonic()
    matches, _ns = dedup.minhash_incremental(
        new, store, threshold=0.9, max_bucket=2000
    )
    n_inc = matches.count()
    t_inc = time.monotonic() - t0
    t0 = time.monotonic()
    sigs_all = dedup.minhash_signatures(docs)
    cand = dedup.minhash_lsh_candidates(sigs_all, max_bucket=2000)
    sa = sigs_all.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs_all.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"))
    n_batch = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("sj", dedup.signature_jaccard(32))
        .where(F.col("sj") >= 0.9)
        .count()
    )
    t_batch = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "minhash_incremental",
                "store_docs": n_old,
                "new_docs": n_new,
                "matches_incremental": n_inc,
                "matches_batch_full": n_batch,
                "secs_store_build_once": round(t_store, 1),
                "secs_incremental": round(t_inc, 1),
                "secs_batch_full": round(t_batch, 1),
                "speedup": round(t_batch / t_inc, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
