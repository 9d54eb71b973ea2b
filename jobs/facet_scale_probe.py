"""search_var_grouped at 32M variable×study hit rows — the round-4
evidence shape (jobs/scale_evidence.py §search family) isolated so the
round-5 single-pass faceting rewrite has a like-for-like before/after.

Round-4 plan: group_variables re-ran per facet key (each facet .count()
re-aggregated all 32M hits).  Round-5 plan: ONE hits aggregation into a
checkpointed grouped frame + ONE combined conditional facet pass; facet
frames are slices of a facet-cardinality-sized checkpoint.

Usage: python jobs/facet_scale_probe.py [--replicate 320]
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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import search
    from dug_spark.session import get_spark

    spark = get_spark("facet_scale_probe", cores=32, shuffle_partitions=64)
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
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
    out = {
        "hits": n_hits,
        "secs": round(time.monotonic() - t0, 1),
        "variables": n_vars,
        "facet_rows": n_facets,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
