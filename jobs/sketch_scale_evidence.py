"""Scale evidence for the KMV distinct sketch (operators/sketch.py).

Question at 10^12 rows: what does "distinct URLs/tokens per host" cost
as a sketch vs as an exact countDistinct?  The sketch's shuffle is
|groups| x buckets rows (constant in the data size); countDistinct's
first shuffle carries every distinct (group, value) pair.  This job
measures both on the same 1.6M-doc token stream (~10^8 token rows,
value decorated with doc_id%64 so per-group cardinality is ~64x the
base vocabulary), reports the speedup and the sketch's worst relative
error across groups, and exercises the merge path (per-slice sketches
unioned by min) to show sketches roll up without re-reading data.

Usage: python jobs/sketch_scale_evidence.py [--replicate 10]
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
B = 64


def _tokens(spark, replicate):
    from pyspark.sql import functions as F

    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"),
            "source",
            "text",
        )
    )
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.explode(F.split("text", " ")),
            F.lit("#"),
            F.pmod(F.col("doc_id"), F.lit(64)).cast("string"),
        ).alias("tok"),
    ).filter(~F.col("tok").startswith("#"))


def main():
    from pyspark.sql import functions as F

    from dug_spark.operators import sketch as sk
    from dug_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("sketch_scale", cores=32, shuffle_partitions=64)
    toks = _tokens(spark, args.replicate)
    n_rows = toks.count()

    # sketch + estimate (one B-bounded shuffle)
    t0 = time.monotonic()
    est = {
        r["source"]: r["est_distinct"]
        for r in sk.kmv_estimate(
            sk.kmv_sketch(toks, ["source"], "tok", B), ["source"], B
        ).collect()
    }
    t_sketch = time.monotonic() - t0

    # exact baseline (distinct-pair shuffle)
    t0 = time.monotonic()
    exact = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    t_exact = time.monotonic() - t0

    errs = {s: abs(est[s] - exact[s]) / exact[s] for s in exact}

    # merge path: sketch each doc_id%4 slice independently, union by min,
    # assert bit-equality with the single-pass sketch
    t0 = time.monotonic()
    slices = [
        sk.kmv_sketch(
            toks.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i),
            ["source"],
            "tok",
            B,
        )
        for i in range(4)
    ]
    merged = slices[0]
    for s in slices[1:]:
        merged = sk.kmv_merge(merged, s, ["source"])
    direct = sk.kmv_sketch(toks, ["source"], "tok", B)
    n_diff = (
        merged.alias("m")
        .join(
            direct.alias("d"),
            ["source", "bucket"],
            "full_outer",
        )
        .filter(
            F.col("m.minh").isNull()
            | F.col("d.minh").isNull()
            | (F.col("m.minh") != F.col("d.minh"))
        )
        .count()
    )
    t_merge = time.monotonic() - t0

    print(
        json.dumps(
            {
                "op": "kmv_sketch",
                "token_rows": n_rows,
                "groups": len(exact),
                "buckets": B,
                "secs_sketch": round(t_sketch, 1),
                "secs_exact_count_distinct": round(t_exact, 1),
                "speedup": round(t_exact / t_sketch, 2),
                "max_rel_err": round(max(errs.values()), 4),
                "mean_rel_err": round(sum(errs.values()) / len(errs), 4),
                "merge_mismatch_rows": n_diff,
                "secs_merge_path": round(t_merge, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
