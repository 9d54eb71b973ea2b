"""Curation-family scale evidence: the full curate_corpus composition,
corpus-global line dedup, and build_vocab at 10x the bench corpus
(1.6M documents = 5k x 320 replicas).

Replicating the corpus verbatim makes every line a 320-member identical
group -- the ADVERSARIAL case for the global line-dedup keeper election
(every non-exempt line goes through a 320-row window partition) and for
the exact-doc election (every doc is a 320-clone cluster).  The organic
variant appends a per-replica token to each line so the corpus-global
dedup finds (almost) nothing -- the common case at crawl scale.

Usage: python jobs/curate_scale_evidence.py [--replicate 320]
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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark import fixtures
    from dug_spark.operators import textstats
    from dug_spark.operators.curate import curate_corpus, curation_report
    from dug_spark.session import get_spark

    spark = get_spark("curate_scale", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    out: dict = {"replicate": args.replicate}

    base = fixtures.webify_documents(
        spark.read.parquet(f"{SF}/documents.parquet").repartition(64)
    )
    docs = base.crossJoin(reps).select(
        (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
        "text",
        "rep",
    )
    n_docs = docs.count()
    out["docs"] = n_docs

    # --- adversarial: identical 320-clone corpus --------------------------
    t0 = time.monotonic()
    rep_adv = curation_report(curate_corpus(docs.select("doc_id", "text"))).collect()[0]
    secs = time.monotonic() - t0
    out["adversarial"] = {
        "secs": round(secs, 1),
        "docs_per_sec": round(n_docs / secs, 1),
        "n_kept": int(rep_adv["n_kept"]),
        "n_canonical": int(rep_adv["n_canonical"]),
        "n_dup_lines_removed": int(rep_adv["n_dup_lines_removed"]),
    }

    # --- organic: per-replica perturbed lines (dedup finds ~nothing) ------
    # per-replica token APPENDED AS A SENTENCE (" r17.") so perturbed
    # lines still pass the C4 terminal-punctuation rule: within one
    # replica the shared boilerplate line is still a cross-doc duplicate
    # (1000-member groups), but the 320 replicas no longer collapse —
    # the organic crawl shape
    perturbed = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split("text", "\n"),
                lambda l: F.concat(
                    l, F.lit(" r"), F.col("rep").cast("string"), F.lit(".")
                ),
            ),
            "\n",
        ).alias("text"),
    )
    t0 = time.monotonic()
    rep_org = curation_report(curate_corpus(perturbed)).collect()[0]
    secs = time.monotonic() - t0
    out["organic"] = {
        "secs": round(secs, 1),
        "docs_per_sec": round(n_docs / secs, 1),
        "n_kept": int(rep_org["n_kept"]),
        "n_dup_lines_removed": int(rep_org["n_dup_lines_removed"]),
    }

    # --- build_vocab over the 1.6M-doc corpus -----------------------------
    t0 = time.monotonic()
    n_vocab = textstats.build_vocab(docs, top_n=50_000).count()
    out["build_vocab"] = {
        "secs": round(time.monotonic() - t0, 1),
        "vocab_rows": n_vocab,
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
