"""Per-query isolation bench (guide §1.4): times individual headline
queries with the noop sink and dumps `.explain("formatted")` plans.

`bench.py` is FROZEN for measurement; this file exists so optimization
work can isolate one query at a time (best-of-N, labeled jobs) and
capture the plan evidence committed under plans/r06/.

Usage:
    python bench_extra.py --queries kg_closure,kg_validate --runs 3
    python bench_extra.py --all --runs 3 --plans plans/r06 --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_fns(spark):
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from dug_spark.operators import dedup, similarity
    import bench

    qs = entry_mod.queries()
    extra_qs = entry_mod.extra_queries()
    all_qs = {**extra_qs, **qs}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    fns = {
        name: (lambda n=name: all_qs[n](spark, SF_DIR))
        for name in bench.HEADLINE_NAMES
    }
    fns.update(
        {
            "dedup_minhash_lsh": lambda: dedup.minhash_near_duplicates(docs),
            "dedup_simhash": lambda: dedup.simhash_near_duplicates(docs),
            "ann_lsh_topk": lambda: similarity.lsh_topk(
                emb.where(F.col("vec_id") < 100), emb, dim=64, k=5
            ),
            "quality_nb": lambda: all_qs["quality_nb"](spark, SF_DIR),
            "span_dedup": lambda: all_qs["span_dedup"](spark, SF_DIR),
            "inverted_index": lambda: all_qs["inverted_index"](spark, SF_DIR),
        }
    )
    return fns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    from dug_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    fns = build_fns(spark)
    names = list(fns) if args.all else [q for q in args.queries.split(",") if q]
    out: dict[str, float] = {}
    for name in names:
        fn = fns[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        best = None
        for _ in range(max(args.runs, 1)):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            s = time.monotonic() - t0
            best = s if best is None else min(best, s)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name:28s} {best:7.3f}", flush=True)
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
