"""Scale evidence for the round-5 selection / graph operators:

1. label_propagation — 2M-node graph, ~8M directed edges with a 1M-degree
   hub (the community-absorbing skew case), shuffle-join mode.
2. taxonomy_rollup   — 2M-node binary-tree DAG (depth 21) with i//3 cross
   edges: the closure is ~40M pairs, the rollup one ancestor-keyed agg.
3. disambiguate_mentions — 1.6M docs × ~4 candidates with 20% ambiguous
   spans; anchors and winners elected with doc-keyed shuffles only.
4. dsir_resample (frac mode) — 1.6M docs scored against a 1/100 trusted
   slice; bucket tables collect, corpus path is one doc-keyed shuffle.

Usage: python jobs/selection_scale_evidence.py [--ops all] [--replicate 320]
Prints one JSON line per op for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def _docs(spark, replicate):
    from pyspark.sql import functions as F

    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"),
            F.col("text"),
            F.col("lang"),
        )
    )


def run_lpa(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import graph

    n = 2_000_000
    base = spark.range(n).select(F.col("id").alias("i")).repartition(64)
    e = base.select(
        F.col("i").cast("string").alias("src"),
        F.explode(
            F.array(
                ((F.col("i") + 1) % n).cast("string"),
                ((F.col("i") * 31 + 7) % n).cast("string"),
                ((F.col("i") * 101 + 3) % n).cast("string"),
                F.when(F.col("i") % 2 == 0, F.lit("0")),  # 1M-degree hub
            )
        ).alias("dst"),
    ).where(F.col("dst").isNotNull())
    n_edges = e.count()
    t0 = time.monotonic()
    labels = graph.label_propagation(e, iterations=3, broadcast_labels=False)
    stats = labels.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.count_distinct("label").alias("n_communities"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "label_propagation",
        "n_edges_in": n_edges,
        "iterations": 3,
        "secs": round(secs, 1),
        "edges_per_sec_per_iter": round(n_edges * 3 / secs),
        "n_nodes": int(stats["n_nodes"]),
        "n_communities": int(stats["n_communities"]),
    }


def run_rollup(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import graph

    n = 2_000_000
    base = spark.range(1, n).select(F.col("id").alias("i")).repartition(64)
    tree = base.select(
        F.col("i").cast("string").alias("src"),
        (F.col("i") / 2).cast("long").cast("string").alias("dst"),
    )
    cross = base.where((F.col("i") >= 2) & (F.col("i") % 5 == 0)).select(
        F.col("i").cast("string").alias("src"),
        (F.col("i") / 3).cast("long").cast("string").alias("dst"),
    )
    edges = tree.unionByName(cross)
    counts = spark.range(n).select(
        F.col("id").cast("string").alias("node"),
        (F.lit(1) + F.col("id") % 3).alias("n"),
    )
    n_edges = edges.count()
    t0 = time.monotonic()
    out = graph.taxonomy_rollup(edges, counts)
    stats = out.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("subtree").alias("root_mass"),
        F.max("n_desc").alias("max_desc"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "taxonomy_rollup",
        "n_edges_in": n_edges,
        "secs": round(secs, 1),
        "edges_per_sec": round(n_edges / secs),
        "n_nodes": int(stats["n_nodes"]),
        "root_subtree_mass": int(stats["root_mass"]),
        "max_descendants": int(stats["max_desc"]),
    }


def run_disambiguate(spark, replicate):
    from pyspark.sql import functions as F

    from dug_spark.operators import link

    # per doc: 3 unambiguous anchor spans + 1 ambiguous span (2 senses,
    # types decided by doc_id arithmetic) — 1.6M docs → ~8M candidates
    docs = _docs(spark, replicate).select("doc_id").localCheckpoint()
    did = F.col("doc_id")
    anchor = docs.select(
        did.cast("string").alias("element_id"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("alpha").alias("search_text"),
                    F.concat(F.lit("A:"), (did % 50).cast("string")).alias("curie"),
                    F.lit(0.9).alias("score"),
                ),
                F.struct(
                    F.lit("beta").alias("search_text"),
                    F.concat(F.lit("B:"), (did % 70).cast("string")).alias("curie"),
                    F.lit(0.9).alias("score"),
                ),
                F.struct(
                    F.lit("gamma").alias("search_text"),
                    F.concat(F.lit("C:"), (did % 90).cast("string")).alias("curie"),
                    F.lit(0.85).alias("score"),
                ),
            )
        ).alias("s"),
    ).select("element_id", "s.search_text", "s.curie", "s.score")
    amb = docs.select(
        did.cast("string").alias("element_id"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("window").alias("search_text"),
                    # same TYPE as the A-anchor but a different curie, so
                    # the anchor votes for this sense (coherence 1 > 0)
                    F.concat(
                        F.lit("A:"), ((did + 1) % 50).cast("string")
                    ).alias("curie"),
                    F.lit(0.7).alias("score"),
                ),
                F.struct(
                    F.lit("window").alias("search_text"),
                    F.concat(F.lit("X:"), (did % 30).cast("string")).alias("curie"),
                    F.lit(0.8).alias("score"),
                ),
            )
        ).alias("s"),
    ).select("element_id", "s.search_text", "s.curie", "s.score")
    cands = anchor.unionByName(amb)
    types = spark.range(200).select(
        F.concat(
            F.element_at(
                F.array(F.lit("A:"), F.lit("B:"), F.lit("C:"), F.lit("X:")),
                (F.col("id") % 4 + 1).cast("int"),
            ),
            (F.col("id") / 4).cast("long").cast("string"),
        ).alias("curie"),
        F.element_at(
            F.array(F.lit("ta"), F.lit("tb"), F.lit("tc"), F.lit("tx")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("ctype"),
    )
    n_cands = cands.count()
    t0 = time.monotonic()
    out = link.disambiguate_mentions(cands, types)
    stats = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("chosen").cast("long")).alias("n_chosen"),
        F.max("coherence").alias("max_coh"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "disambiguate_mentions",
        "n_candidates": n_cands,
        "secs": round(secs, 1),
        "candidates_per_sec": round(n_cands / secs),
        "n_rows_out": int(stats["n_rows"]),
        "n_chosen": int(stats["n_chosen"]),
        "max_coherence": int(stats["max_coh"]),
    }


def run_dsir(spark, replicate):
    from pyspark.sql import functions as F

    from dug_spark.operators import importance

    docs = _docs(spark, replicate).localCheckpoint()
    n_docs = docs.count()
    target = docs.where((F.col("lang") == "en") & (F.col("doc_id") % 100 == 0))
    t0 = time.monotonic()
    out = importance.dsir_resample(
        docs, target, frac=0.25, buckets=4096
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "dsir_resample",
        "n_docs": n_docs,
        "secs": round(secs, 1),
        "docs_per_sec": round(n_docs / secs),
        "n_rows_out": int(stats["n_rows"]),
        "n_kept": int(stats["n_kept"]),
        "kept_frac": round(stats["n_kept"] / n_docs, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=320)
    ap.add_argument(
        "--ops", default="all", help="comma list: lpa,rollup,disambig,dsir"
    )
    args = ap.parse_args()
    ops = (
        args.ops.split(",")
        if args.ops != "all"
        else ["lpa", "rollup", "disambig", "dsir"]
    )

    from dug_spark.session import get_spark

    spark = get_spark("selection_scale", cores=32, shuffle_partitions=64)
    if "lpa" in ops:
        print(json.dumps(run_lpa(spark)), flush=True)
    if "rollup" in ops:
        print(json.dumps(run_rollup(spark)), flush=True)
    if "disambig" in ops:
        print(json.dumps(run_disambiguate(spark, args.replicate)), flush=True)
    if "dsir" in ops:
        print(json.dumps(run_dsir(spark, args.replicate)), flush=True)


if __name__ == "__main__":
    main()
