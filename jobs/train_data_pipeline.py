"""End-to-end training-data pipeline composition over a web-shaped
corpus: curate → LM-perplexity filter → sequence packing — the full path
from raw Common-Crawl-style pages to packed training sequences, with
per-stage survivor counts from single aggregations (no per-stage
count() rescans of the corpus).

Stage inventory (see SCALE.md for the shuffle budget of each):
  1. curate_corpus   — C4 line clean → Gopher gates → PII redaction →
                       corpus-global line dedup → exact-doc keeper election
  2. perplexity      — bigram LM trained on the unreplicated trusted
                       slice; CCNet keep-rule = head+middle buckets
  3. pack_sequences  — budget-2048 greedy packing in 1024 shards

Usage: python jobs/train_data_pipeline.py [--replicate 320]
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
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark import fixtures
    from dug_spark.operators import lm
    from dug_spark.operators.curate import curate_corpus
    from dug_spark.session import get_spark

    spark = get_spark("train_data", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    out: dict = {"replicate": args.replicate}

    base = fixtures.webify_documents(
        spark.read.parquet(f"{SF}/documents.parquet").repartition(64)
    )
    # organic replicas — per-replica suffix on EVERY line (kept as a
    # sentence so the C4 terminal-punctuation rule still passes): the 320
    # replicas do not collapse under global line dedup, the crawl shape.
    # (A per-doc tail line instead leaves every body line a 320-member
    # clone group and the pipeline correctly collapses 1.6M docs to the
    # ~1.5k keepers — measured: that run is the adversarial shape.)
    docs = (
        base.crossJoin(reps)
        .withColumn("sfx", F.concat(F.lit(" r"), F.col("rep").cast("string"), F.lit(".")))
        .select(
            (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
            # append the per-replica suffix to every line WITHOUT a
            # higher-order-function lambda: an outer row reference inside
            # transform() trips a BindReferences INTERNAL_ERROR once this
            # plan flows through the later mapInPandas stages (Spark 4.1,
            # crossJoin + HOF + column pruning); plain replace() with
            # Column arguments compiles clean
            F.concat(
                F.replace(
                    F.col("text"),
                    F.lit("\n"),
                    F.concat(F.col("sfx"), F.lit("\n")),
                ),
                F.col("sfx"),
            ).alias("text"),
        )
    )
    n_docs = docs.count()
    out["docs"] = n_docs
    t_start = time.monotonic()

    # stage 1: curation (one frame carries every gate verdict);
    # checkpointed because stages 2-3 and the survivor counts all read it
    # — without the cut each downstream action re-runs the whole curation
    curated = (
        curate_corpus(docs)
        .where(F.col("keep"))
        .select("doc_id", F.col("curated_text").alias("text"))
        .localCheckpoint(eager=True)
    )

    # stage 2: CCNet keep-rule — LM trained on a trusted IN-DOMAIN slice
    # of the curated corpus itself (~1/997 of survivors; training on the
    # pre-curation text makes every doc score tail — the per-line replica
    # tokens are 100% OOV to it), keep head+middle of the survivors
    ref = curated.where(F.col("doc_id") % 997 == 0)
    # held-out calibration slice (disjoint from the training slice): the
    # tiny LM memorizes its ~500 training docs, so in-train tertiles
    # would push every out-of-train doc to tail (measured: 405 of 495k
    # kept); calibrating on held-out scores keeps the intended ~2/3
    calib = curated.where(
        (F.col("doc_id") % 991 == 0) & (F.col("doc_id") % 997 != 0)
    )
    scored = lm.perplexity_filter(curated, ref, cutoff_ref=calib)
    kept = (
        scored.where(F.col("ppl_bucket").isin("head", "middle"))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )

    # stage 3: packing
    packed = lm.pack_sequences(
        kept, budget=args.budget, n_shards=args.n_shards
    )

    # one aggregation per stage FRAME (3 actions total, each fused)
    stats = packed.groupBy().agg(
        F.count(F.lit(1)).alias("docs_packed"),
        F.countDistinct("shard", "seq_id").alias("sequences"),
        F.sum("n_tokens").alias("tokens"),
        F.sum(F.col("oversize").cast("int")).alias("oversize"),
    ).collect()[0]
    n_curated = curated.count()
    n_kept = kept.count()
    secs = round(time.monotonic() - t_start, 1)

    out.update(
        {
            "secs": secs,
            "docs_per_sec": round(n_docs / secs, 1),
            "survivors": {
                "curated": n_curated,
                "ppl_head_middle": n_kept,
                "packed_docs": stats["docs_packed"],
            },
            "sequences": stats["sequences"],
            "tokens": stats["tokens"],
            "oversize": stats["oversize"],
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
