"""Scale evidence for the round-5 graph-analytics + model-curation
operators at 1.6M docs / multi-million-edge graphs:

1. co_mention_npmi  — NPMI edge weighting over 1.6M synthetic documents'
   concept sets (hot-concept skew included: concept c0 appears in ~1/2 of
   all docs, the "ubiquitous UMLS term" shape).
2. triangle_counts  — host-graph scale: ~200k hosts, ~4.8M undirected
   edges with a power-law-ish hub (hub host linked from ~100k others) to
   prove the degree-orientation skew bound.
3. quality_classifier — NB train (one aggregation) + map-only scoring at
   1.6M docs.
4. remove_duplicate_spans — 1.6M docs where ~1/7 share an injected
   10-token boilerplate (~229k duplicated occurrences of the same hot
   8-gram family — the worst-case hot-fingerprint skew).

Usage: python jobs/analytics_scale_evidence.py [--replicate 320] [--ops all]
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


def run_npmi(spark, replicate):
    from pyspark.sql import functions as F

    from dug_spark.operators import triples as T

    # synthetic mention table: doc i mentions c0 if i%2==0 (the hot
    # ubiquitous concept), plus 3 mid-frequency concepts from a 10k pool
    base = spark.range(500_000 * max(1, replicate // 100)).select(
        F.col("id").alias("did")
    )
    m = base.select(
        F.col("did"),
        F.array(
            F.when(F.col("did") % 2 == 0, F.lit("C:0")),
            F.concat(F.lit("C:"), ((F.col("did") * 7) % 10_000 + 1).cast("string")),
            F.concat(F.lit("C:"), ((F.col("did") * 13) % 10_000 + 1).cast("string")),
            F.concat(F.lit("C:"), ((F.col("did") * 29) % 10_000 + 1).cast("string")),
        ).alias("cs"),
    ).select(
        F.col("did").cast("string").alias("element_id"),
        F.explode(F.filter("cs", lambda c: c.isNotNull())).alias("curie"),
    )
    n_mentions = m.count()
    t0 = time.monotonic()
    edges = T.co_mention_npmi(m)
    stats = edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.max("n_co").alias("max_co"),
        F.min("npmi").alias("min_npmi"),
        F.max("npmi").alias("max_npmi"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "co_mention_npmi",
        "n_mentions": n_mentions,
        "secs": round(secs, 1),
        "mentions_per_sec": round(n_mentions / secs),
        "n_edges": int(stats["n_edges"]),
        "max_co": int(stats["max_co"]),
        "npmi_range": [float(stats["min_npmi"]), float(stats["max_npmi"])],
    }


def run_triangles(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import graph

    # 200k hosts; each host i links to 3 arithmetic neighbors (locally
    # clustered) AND host 0 is linked from every 2nd host (a 100k-degree
    # hub that the orientation must neutralize)
    n_hosts = 200_000
    base = spark.range(n_hosts).select(F.col("id").alias("i")).repartition(64)
    e = base.select(
        F.col("i").cast("string").alias("src"),
        F.explode(
            F.array(
                ((F.col("i") + 1) % n_hosts).cast("string"),
                ((F.col("i") + 2) % n_hosts).cast("string"),
                ((F.col("i") * 17 + 5) % n_hosts).cast("string"),
                F.when(F.col("i") % 2 == 0, F.lit("0")),
            )
        ).alias("dst"),
    ).where(F.col("dst").isNotNull())
    n_edges = e.count()
    t0 = time.monotonic()
    tc = graph.triangle_counts(e)
    stats = tc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("triangles").alias("tri_endpoints"),
        F.max("degree").alias("max_deg"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "triangle_counts",
        "n_edges_in": n_edges,
        "secs": round(secs, 1),
        "edges_per_sec": round(n_edges / secs),
        "n_nodes": int(stats["n_nodes"]),
        "triangles_total": int(stats["tri_endpoints"]) // 3,
        "max_degree": int(stats["max_deg"]),
    }


def run_classifier(spark, replicate):
    from pyspark.sql import functions as F

    from dug_spark.operators import classify

    docs = _docs(spark, replicate).withColumn(
        "label", F.col("lang") == "en"
    ).localCheckpoint()
    n = docs.count()
    t0 = time.monotonic()
    w, b = classify.train_nb(docs, vocab_size=512)
    t_train = time.monotonic() - t0
    t1 = time.monotonic()
    scored = classify.nb_score(docs, w, b)
    kept = scored.agg(
        F.sum(F.col("nb_keep").cast("long")).alias("k"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    t_score = time.monotonic() - t1
    return {
        "op": "quality_classifier",
        "docs": n,
        "train_secs": round(t_train, 1),
        "score_secs": round(t_score, 1),
        "score_docs_per_sec": round(n / t_score),
        "keep_rate": round(int(kept["k"]) / int(kept["n"]), 4),
        "vocab": len(w),
    }


def run_span_dedup(spark, replicate):
    from pyspark.sql import functions as F

    from dug_spark.operators import dedup

    bp = " bq1 bq2 bq3 bq4 bq5 bq6 bq7 bq8 bq9 bq10"
    docs = _docs(spark, replicate).select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("doc_id"),
        F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(bp)))
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint()
    n = docs.count()
    t0 = time.monotonic()
    out = dedup.remove_duplicate_spans(docs, id_col="doc_id", k=8)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens_removed").alias("rm"),
        F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias("docs_hit"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "remove_duplicate_spans",
        "docs": n,
        "secs": round(secs, 1),
        "docs_per_sec": round(n / secs),
        "tokens_removed": int(stats["rm"]),
        "docs_hit": int(stats["docs_hit"]),
    }


def run_closure(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import graph

    # 1.6M-node subsumption DAG, the oracle's shape at 3200×: binary-tree
    # parent i//2 everywhere + a second parent i//3 on every 5th node
    # (multi-path min-depth at scale); depth ≈ log2(1.6M) ≈ 21 rounds
    n = 1_600_000
    ids = spark.range(1, n).select(F.col("id").alias("i")).repartition(64)
    e = ids.select(
        F.col("i").cast("string").alias("src"),
        F.explode(
            F.array(
                F.floor(F.col("i") / 2).cast("string"),
                F.when(
                    (F.col("i") % 5 == 0) & (F.col("i") >= 2),
                    F.floor(F.col("i") / 3).cast("string"),
                ),
            )
        ).alias("dst"),
    ).where(F.col("dst").isNotNull())
    n_edges = e.count()
    t0 = time.monotonic()
    tc = graph.transitive_closure(e, max_iterations=40)
    stats = tc.agg(
        F.count(F.lit(1)).alias("pairs"), F.max("depth").alias("max_depth")
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "transitive_closure",
        "nodes": n,
        "n_edges_in": n_edges,
        "secs": round(secs, 1),
        "closure_pairs": int(stats["pairs"]),
        "max_depth": int(stats["max_depth"]),
        "pairs_per_sec": round(int(stats["pairs"]) / secs),
    }


def run_hits(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import graph

    # same 200k-host hub-skewed graph as run_triangles, directed as built
    n_hosts = 200_000
    base = spark.range(n_hosts).select(F.col("id").alias("i")).repartition(64)
    e = base.select(
        F.col("i").cast("string").alias("src"),
        F.explode(
            F.array(
                ((F.col("i") + 1) % n_hosts).cast("string"),
                ((F.col("i") + 2) % n_hosts).cast("string"),
                ((F.col("i") * 17 + 5) % n_hosts).cast("string"),
                F.when(F.col("i") % 2 == 0, F.lit("0")),
            )
        ).alias("dst"),
    ).where(F.col("dst").isNotNull()).localCheckpoint()
    n_edges = e.count()
    t0 = time.monotonic()
    out = graph.hits(e, iterations=10, broadcast_scores=False)
    top = out.orderBy(F.desc("authority")).limit(1).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "hits",
        "n_edges_in": n_edges,
        "iterations": 10,
        "secs": round(secs, 1),
        "secs_per_iter": round(secs / 10, 2),
        "top_authority_node": top["node"],
        "top_authority": round(top["authority"], 4),
    }


def run_relations(spark, replicate):
    from pyspark.sql import functions as F

    from dug_spark import fixtures
    from dug_spark.operators import relations

    did = F.col("doc_id")
    terms = F.array(*[F.lit(t) for t in ("window", "filter", "scan", "stream")])
    docs = _docs(spark, replicate).select(
        "doc_id",
        F.concat(
            F.lower(F.coalesce(F.col("text"), F.lit(""))),
            F.lit(" . "),
            F.element_at(terms, (did % 4 + 1).cast("int")),
            F.when(did % 2 == 0, F.lit(" causes ")).otherwise(F.lit(" treats ")),
            F.element_at(terms, ((did + 1) % 4 + 1).cast("int")),
            F.lit(" ."),
        ).alias("text"),
    ).localCheckpoint()
    n = docs.count()
    t0 = time.monotonic()
    rel = relations.extract_relations(
        docs, fixtures.vocab_dictionary(spark), text_col="text", id_col="doc_id"
    )
    n_rel = rel.count()
    secs = time.monotonic() - t0
    return {
        "op": "extract_relations",
        "docs": n,
        "secs": round(secs, 1),
        "docs_per_sec": round(n / secs),
        "relations": n_rel,
    }


def run_inverted_index(spark, replicate):
    from pyspark.sql import functions as F

    from dug_spark.operators import search

    docs = _docs(spark, replicate).localCheckpoint()
    n = docs.count()
    t0 = time.monotonic()
    idx = search.build_inverted_index(
        docs, text_col="text", id_col="doc_id", num_shards=64, min_df=2
    )
    stats = idx.agg(
        F.count(F.lit(1)).alias("rows"),
        F.max("df").alias("max_shard_df"),
        F.count_distinct("token").alias("tokens"),
    ).collect()[0]
    secs = time.monotonic() - t0
    return {
        "op": "build_inverted_index",
        "docs": n,
        "num_shards": 64,
        "secs": round(secs, 1),
        "docs_per_sec": round(n / secs),
        "index_rows": int(stats["rows"]),
        "distinct_tokens": int(stats["tokens"]),
        "max_shard_postings": int(stats["max_shard_df"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=320)
    ap.add_argument(
        "--ops", default="all",
        help="comma list: npmi,triangles,classifier,spans,closure,hits,"
        "relations,invidx",
    )
    args = ap.parse_args()
    ops = args.ops.split(",") if args.ops != "all" else [
        "npmi", "triangles", "classifier", "spans",
        "closure", "hits", "relations", "invidx",
    ]

    from dug_spark.session import get_spark

    spark = get_spark("analytics_scale", cores=32, shuffle_partitions=64)
    if "npmi" in ops:
        print(json.dumps(run_npmi(spark, args.replicate)), flush=True)
    if "triangles" in ops:
        print(json.dumps(run_triangles(spark)), flush=True)
    if "classifier" in ops:
        print(json.dumps(run_classifier(spark, args.replicate)), flush=True)
    if "spans" in ops:
        print(json.dumps(run_span_dedup(spark, args.replicate)), flush=True)
    if "closure" in ops:
        print(json.dumps(run_closure(spark)), flush=True)
    if "hits" in ops:
        print(json.dumps(run_hits(spark)), flush=True)
    if "relations" in ops:
        print(json.dumps(run_relations(spark, args.replicate)), flush=True)
    if "invidx" in ops:
        print(json.dumps(run_inverted_index(spark, args.replicate)), flush=True)


if __name__ == "__main__":
    main()
