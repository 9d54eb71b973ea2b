"""Scale evidence for the round-5 (cont. 6) operators:

1. Misra-Gries heavy hitters (sketch.heavy_hitters) vs the exact
   groupBy-count hot-key pass (plans/skew.hot_keys) on a skewed
   ~10^8-row token stream.  The number that matters at 10^12 rows is
   SHUFFLE VOLUME: exact shuffles one row per distinct (key) per map
   task; MG shuffles at most (k+1) rows per partition, then verifies
   the broadcast candidates exactly.  We report both wall times AND the
   summary-row count vs the distinct-key count, plus output equality.

2. weighted_sample_per_group at 1.6M docs: one-pass window vs the
   salted two-phase path — identical output required, both timed.

3. stream_exact_dedup: two ~0.8M-doc micro-batches with 50% cross-batch
   overlap through the state store; reports docs/s and that the second
   batch re-emits nothing it saw in the first.

Usage: python jobs/hotkeys_scale_evidence.py [--replicate 10]
Prints one JSON line per section for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.session import get_spark
    from dug_spark.operators.sketch import heavy_hitters, mg_partition_summaries
    from dug_spark.operators.importance import weighted_sample_per_group
    from dug_spark.plans.skew import hot_keys

    spark = get_spark("hotkeys_scale", cores=32, shuffle_partitions=64)

    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
            "n_chars",
        )
        .localCheckpoint()
    )
    n_docs = docs.count()

    # --- 1. MG heavy hitters vs exact hot keys --------------------------
    # token stream decorated with doc_id%100003 so the tail key space is
    # ~10^5x the base vocabulary (millions of distinct keys at 1.6M docs)
    # while ~1/5 of the vocabulary stays undecorated and heavy: the
    # zipf-ish shape (few ubiquitous keys, huge cold tail) that makes
    # exact hot-key detection shuffle-bound at 10^12 rows.
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("t"), F.col("doc_id")
    ).where(F.col("t") != "").select(
        F.when(
            F.xxhash64("t") % 5 == 0, F.col("t")  # ~1/5 of vocab stays hot
        )
        .otherwise(
            F.concat("t", F.lit("#"), (F.col("doc_id") % 100003).cast("string"))
        )
        .alias("tok")
    )
    toks = toks.localCheckpoint()
    n_rows = toks.count()
    min_count = n_rows // 2000 + 1  # 0.05% of the stream
    k = 4096  # k+1 > 2000 ⇒ guarantee holds

    t0 = time.monotonic()
    mg = {
        (r["tok"], r["cnt"])
        for r in heavy_hitters(toks, "tok", min_count, k=k).collect()
    }
    t_mg = time.monotonic() - t0

    t0 = time.monotonic()
    exact = {
        (r["tok"], r["cnt"])
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .collect()
    }
    t_exact = time.monotonic() - t0

    summary_rows = mg_partition_summaries(toks, "tok", k).count()
    distinct_keys = toks.select("tok").distinct().count()

    print(
        json.dumps(
            {
                "op": "mg_heavy_hitters",
                "token_rows": n_rows,
                "distinct_keys": distinct_keys,
                "k": k,
                "min_count": min_count,
                "hitters": len(exact),
                "outputs_equal": mg == exact,
                "summary_shuffle_rows": summary_rows,
                "shuffle_rows_saved_ratio": round(distinct_keys / summary_rows, 1),
                "secs_mg": round(t_mg, 1),
                "secs_exact": round(t_exact, 1),
            }
        ),
        flush=True,
    )

    # --- 2. weighted sampler: one-pass vs salted two-phase --------------
    t0 = time.monotonic()
    one = weighted_sample_per_group(
        docs, "lang", "doc_id", k=100, weight_col="n_chars", seed=11
    ).collect()
    t_one = time.monotonic() - t0
    t0 = time.monotonic()
    two = weighted_sample_per_group(
        docs, "lang", "doc_id", k=100, weight_col="n_chars", seed=11,
        salt_factor=16,
    ).collect()
    t_two = time.monotonic() - t0
    same = sorted(map(tuple, one)) == sorted(map(tuple, two))
    print(
        json.dumps(
            {
                "op": "weighted_sample_per_group",
                "docs": n_docs,
                "groups": docs.select("lang").distinct().count(),
                "k": 100,
                "salted_equals_onepass": same,
                "secs_onepass": round(t_one, 1),
                "secs_salted16": round(t_two, 1),
            }
        ),
        flush=True,
    )

    # --- 3. streaming cross-batch dedup ----------------------------------
    from dug_spark.streaming.ingest import stream_exact_dedup

    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        in_dir, ckpt = f"{td}/in", f"{td}/ckpt"
        half = docs.where(F.col("doc_id") % 2 == 0).select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            "text",
        )
        # batch 1: even docs; batch 2: same texts under new urls (pure
        # cross-batch dups) plus the odd docs (new)
        half.coalesce(8).write.parquet(in_dir)
        b2 = docs.select(
            F.concat(F.lit("v"), F.col("doc_id").cast("string")).alias("url"),
            "text",
        )
        b2.coalesce(8).write.mode("append").parquet(in_dir)
        n_stream = half.count() + n_docs
        t0 = time.monotonic()
        stream = (
            spark.readStream.schema(half.schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(in_dir)
        )
        q = (
            stream_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("sdedup_scale")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1200)
        t_stream = time.monotonic() - t0
        out_n = spark.sql("SELECT COUNT(*) c FROM sdedup_scale").collect()[0]["c"]
        exact_n = docs.select(F.xxhash64("text")).distinct().count()
        print(
            json.dumps(
                {
                    "op": "stream_exact_dedup",
                    "stream_rows": n_stream,
                    "distinct_hashes": exact_n,
                    "emitted": out_n,
                    "exactly_once": out_n == exact_n,
                    "secs": round(t_stream, 1),
                    "docs_per_sec": round(n_stream / t_stream, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
