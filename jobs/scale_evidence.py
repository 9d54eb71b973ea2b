"""Dedup scale evidence: minhash-LSH and embedding-LSH at 10× the bench
corpus (1.6M docs / 1.6M vectors) with bucket-size accounting.

Replicating the corpus makes every source row a 320-member identical
cluster — the ADVERSARIAL case for LSH banding (Σ bucket² grows
quadratically in cluster size).  This job records:
  1. lsh_bucket_stats BEFORE the join: predicted Σ bucket² cost, max
     bucket, and what a max_bucket cap drops (the coverage ledger);
  2. the capped run's wall time + output count at 1.6M rows;
  3. an organic variant for embeddings (per-replica perturbation) where
     buckets stay small and no cap is needed.

Usage: python jobs/scale_evidence.py [--replicate 320] [--cap 100]
Prints one JSON line for BASELINE.md §scale.
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

    spark = get_spark("scale_evidence", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    out: dict = {"replicate": args.replicate, "cap": args.cap}

    # --- minhash text path: 5k docs × replicate (identical clusters) ----
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * args.replicate + F.col("rep")).alias("doc_id"),
            "text",
        )
    )
    n_docs = docs.count()
    sh = docs.select(
        F.col("doc_id").alias("doc"),
        F.filter(dedup._shingles("text", 3), lambda s: F.length(s) > 0).alias("shs"),
    ).where(F.size("shs") > 0)
    banded = dedup.minhash_banded(
        sh.select("doc", dedup.minhash_signature_col(32).alias("sig"))
    )
    t0 = time.monotonic()
    stats = dedup.lsh_bucket_stats(banded, max_bucket=args.cap)
    out["minhash"] = {
        "docs": n_docs,
        "stats_secs": round(time.monotonic() - t0, 1),
        **{k: int(v) for k, v in stats.items()},
    }
    t0 = time.monotonic()
    n_pairs = dedup.minhash_near_duplicates(
        docs, threshold=0.9, max_bucket=args.cap
    ).count()
    out["minhash"]["capped_run_secs"] = round(time.monotonic() - t0, 1)
    out["minhash"]["capped_pairs"] = n_pairs

    # --- embedding path: adversarial (identical) vs organic (perturbed) --
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").repartition(64)
    factor = max(args.replicate * 5000 // 2000, 1)  # match ~1.6M vectors
    reps_e = spark.range(factor).select(F.col("id").alias("rep"))
    ident = emb.crossJoin(reps_e).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"), "embedding"
    )
    n_vec = ident.count()
    from dug_spark.operators import similarity

    sigs = similarity.lsh_signatures(ident, dim=64, bits=64, id_col="vec_id",
                                     vec_col="embedding")
    banded_e = similarity.hyperplane_banded(sigs, bits=64, bands=8)
    t0 = time.monotonic()
    stats_e = dedup.lsh_bucket_stats(banded_e, max_bucket=args.cap)
    out["embedding_adversarial"] = {
        "vecs": n_vec,
        "stats_secs": round(time.monotonic() - t0, 1),
        **{k: int(v) for k, v in stats_e.items()},
    }
    t0 = time.monotonic()
    n_pairs_e = dedup.embedding_near_duplicates(
        ident, threshold=0.95, max_bucket=args.cap
    ).count()
    out["embedding_adversarial"]["capped_run_secs"] = round(time.monotonic() - t0, 1)
    out["embedding_adversarial"]["capped_pairs"] = n_pairs_e

    # organic: deterministic per-replica perturbation breaks the clusters —
    # replicas of the same vector land ~orthogonal, buckets stay balanced
    organic = emb.crossJoin(reps_e).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + 2.0 * sin(cast(rep * (i + 1) as double)))"
        ).alias("embedding"),
    )
    sigs_o = similarity.lsh_signatures(organic, dim=64, bits=64, id_col="vec_id",
                                       vec_col="embedding")
    banded_o = similarity.hyperplane_banded(sigs_o, bits=64, bands=8)
    t0 = time.monotonic()
    stats_o = dedup.lsh_bucket_stats(banded_o)
    out["embedding_organic"] = {
        "vecs": n_vec,
        "stats_secs": round(time.monotonic() - t0, 1),
        **{k: int(v) for k, v in stats_o.items()},
    }

    # --- auto band-width (round 4): width follows corpus size ------------
    # at ~1.6M rows auto_band_width -> 15 bits (32768 buckets/band) vs the
    # fixed 8-bit rows above; on the ORGANIC corpus this divides Σ bucket²
    # by ~2^(15-8); on the adversarial identical-cluster corpus the
    # mega-buckets persist at any width (clones share every bank) — the
    # cap stays the guard there, which is the point of recording both
    w_auto = similarity.auto_band_width(n_vec)
    out["auto_band_width"] = w_auto
    for label, src, cap in [
        ("embedding_adversarial_auto", ident, args.cap),
        ("embedding_organic_auto", organic, None),
    ]:
        banded_a = similarity.lsh_band_buckets(
            src, dim=64, width=w_auto, bands=8, id_col="vec_id",
            vec_col="embedding",
        )
        t0 = time.monotonic()
        stats_a = dedup.lsh_bucket_stats(banded_a, max_bucket=cap)
        out[label] = {
            "vecs": n_vec,
            "width": w_auto,
            "stats_secs": round(time.monotonic() - t0, 1),
            **{k: int(v) for k, v in stats_a.items()},
        }
    t0 = time.monotonic()
    n_pairs_a = dedup.embedding_near_duplicates(
        ident, threshold=0.95, band_width="auto", n_rows=n_vec,
        max_bucket=args.cap,
    ).count()
    out["embedding_adversarial_auto"]["capped_run_secs"] = round(
        time.monotonic() - t0, 1
    )
    out["embedding_adversarial_auto"]["capped_pairs"] = n_pairs_a

    # --- search family at 1.6M docs (round 4) ---------------------------
    # bm25: ONE stats agg + map-side score + TakeOrderedAndProject — the
    # scored corpus is never shuffled, so wall time ~= one corpus scan;
    # search_var_grouped: group/flatten + exclude-own-filter facets
    from dug_spark.operators import search

    t0 = time.monotonic()
    bm = search.bm25_topk(docs, "spark window stream", k=20)
    n_bm = bm.count()
    out["search_bm25"] = {
        "docs": n_docs,
        "secs": round(time.monotonic() - t0, 1),
        "rows": n_bm,
    }
    plan = bm._jdf.queryExecution().executedPlan().toString()
    out["search_bm25"]["take_ordered_plan"] = "TakeOrdered" in plan

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("event_id") * args.replicate + F.col("rep")).alias("eid"),
            "event_id",
            "user_id",
        )
    )
    hits = ev.select(
        (F.col("eid") % 50000).cast("string").alias("element_id"),
        F.concat(F.lit("var "), (F.col("eid") % 50000).cast("string")).alias(
            "element_name"
        ),
        F.concat(F.lit("desc "), (F.col("eid") % 50000).cast("string")).alias(
            "element_desc"
        ),
        F.when((F.col("eid") % 50000) % 2 == 0, "dbgap")
        .otherwise("topmed")
        .alias("data_type"),
        F.concat(F.lit("study_"), (F.col("user_id") % 2000).cast("string")).alias(
            "collection_id"
        ),
        F.concat(F.lit("Study "), (F.col("user_id") % 2000).cast("string")).alias(
            "collection_name"
        ),
    )
    n_hits = hits.count()
    t0 = time.monotonic()
    res = search.search_var_grouped(
        hits,
        filters={"study name": ["Study 3", "Study 5"], "data_type": ["dbgap"]},
        facet_keys=["data_type", "study name"],
    )
    n_vars = res["variables"].count()
    n_facets = sum(df.count() for df in res["agg_counts"].values())
    out["search_var_grouped"] = {
        "hits": n_hits,
        "secs": round(time.monotonic() - t0, 1),
        "variables": n_vars,
        "facet_rows": n_facets,
    }

    # --- corpus-global line dedup at 1.6M docs (round 4) ----------------
    # Every source doc becomes a `replicate`-member identical cluster at
    # line granularity — the adversarial case for the keeper-election
    # window (each distinct line value has `replicate` occurrences; the
    # hottest shared lines are exactly what min_words exempts into
    # singleton partitions).  Records wall time + removed-line count and
    # asserts the plan stayed at two exchanges (window + reassembly).
    t0 = time.monotonic()
    cdl = dedup.cross_doc_line_dedup(docs, min_words=2)
    removed = cdl.agg(
        F.sum("n_lines_removed").alias("r"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    out["cross_doc_line_dedup"] = {
        "docs": n_docs,
        "secs": round(time.monotonic() - t0, 1),
        "lines_removed": int(removed["r"]),
        "docs_out": int(removed["n"]),
        "two_exchange_plan": cdl._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("Exchange hashpartitioning")
        == 2,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
