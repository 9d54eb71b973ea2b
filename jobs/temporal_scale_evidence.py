"""Scale evidence for the temporal operators (operators/temporal.py):
as-of join, bucketed range join, batch sessionization.

Events are replicated with FRESH user ids (user_id + rep*1000) so
per-key density stays constant while the key space scales — the shape a
10^12-capture crawl table has (billions of URLs, bounded captures per
URL).  Reports wall times; for the range join, the bucketed rewrite is
timed against the naive interval-predicate join on the same input (the
thing it replaces), both row-count-verified equal.

Usage: python jobs/temporal_scale_evidence.py [--replicate 320]
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
    from dug_spark.operators.temporal import (
        asof_join,
        range_join_bucketed,
        sessionize,
    )

    spark = get_spark("temporal_scale", cores=32, shuffle_partitions=64)

    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("event_id") * args.replicate + F.col("rep")).alias("event_id"),
            (F.col("user_id") + F.col("rep") * 1000).alias("user_id"),
            "ts",
            "event_type",
            "value",
        )
        .localCheckpoint()
    )
    n_ev = ev.count()
    n_users = ev.select("user_id").distinct().count()

    # --- as-of join ------------------------------------------------------
    left = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    t0 = time.monotonic()
    res = asof_join(left, right, "user_id", "ts", "ts", ["value"])
    n_asof = res.count()
    matched = res.where(F.col("value").isNotNull()).count()
    t_asof = time.monotonic() - t0
    plan = res._jdf.queryExecution().executedPlan().toString()
    print(
        json.dumps(
            {
                "op": "asof_join",
                "events": n_ev,
                "users": n_users,
                "left_rows": n_asof,
                "matched": matched,
                "secs": round(t_asof, 1),
                "rows_per_sec": round((n_asof) / t_asof, 1),
                "plan_has_join_node": "Join" in plan,
            }
        ),
        flush=True,
    )

    # --- bucketed range join vs naive -------------------------------------
    base = 1704067200
    w = (
        spark.range(10)
        .select(F.col("id").alias("ub"))
        .crossJoin(spark.range(30).select(F.col("id").alias("j")))
        .select(
            "ub",
            (F.col("ub") * 100 + F.col("j")).alias("win_id"),
            ((F.lit(base) + F.col("j") * 86400 + F.col("ub") * 3600)).alias("s"),
            (
                F.lit(base)
                + F.col("j") * 86400
                + F.col("ub") * 3600
                + (F.lit(1) + (F.col("ub") + F.col("j")) % 3) * 5400
            ).alias("e"),
        )
        .localCheckpoint()
    )
    pts = ev.select(
        "event_id",
        (F.col("user_id") % 10).alias("ub"),
        F.col("ts").cast("timestamp").cast("double").alias("pt"),
    ).localCheckpoint()
    n_pts = pts.count()
    t0 = time.monotonic()
    n_bucketed = range_join_bucketed(pts, w, "ub", "pt", "s", "e", 3600.0).count()
    t_bucketed = time.monotonic() - t0
    t0 = time.monotonic()
    n_naive = (
        pts.join(w, "ub")
        .where((F.col("s") <= F.col("pt")) & (F.col("pt") < F.col("e")))
        .count()
    )
    t_naive = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "range_join_bucketed",
                "points": n_pts,
                "windows": 300,
                "matches": n_bucketed,
                "equal_to_naive": n_bucketed == n_naive,
                "secs_bucketed": round(t_bucketed, 1),
                "secs_naive": round(t_naive, 1),
            }
        ),
        flush=True,
    )

    # --- sessionize --------------------------------------------------------
    t0 = time.monotonic()
    sess = sessionize(ev, "user_id", "ts", gap_seconds=3600.0)
    n_sessions = sess.groupBy("user_id").agg(
        F.max("session_seq").alias("m")
    ).agg(F.sum("m")).collect()[0][0]
    t_sess = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "sessionize",
                "events": n_ev,
                "sessions": int(n_sessions),
                "secs": round(t_sess, 1),
                "events_per_sec": round(n_ev / t_sess, 1),
            }
        ),
        flush=True,
    )


def dense_section(replicate: int = 320) -> None:
    """The workload class range_join_bucketed exists for: a window table
    too dense for the naive per-key join (naive pre-filter pairs =
    |points_per_key| x |windows_per_key| — 23G pairs here, infeasible),
    run bucketed in full; the naive join is timed on a 0.5% point sample
    and extrapolated linearly (its work is pair-count-proportional)."""
    from pyspark.sql import functions as F

    from dug_spark.session import get_spark
    from dug_spark.operators.temporal import range_join_bucketed

    spark = get_spark("temporal_dense", cores=32, shuffle_partitions=64)
    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    base = 1704067200
    pts = (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartition(64)
        .crossJoin(reps)
        .select(
            (F.col("event_id") * replicate + F.col("rep")).alias("event_id"),
            (F.col("user_id") % 10).alias("ub"),
            F.col("ts").cast("timestamp").cast("double").alias("pt"),
        )
        .localCheckpoint()
    )
    n_pts = pts.count()
    # 720 hourly windows per key, width 0.5-1.5 h
    w = (
        spark.range(10)
        .select(F.col("id").alias("ub"))
        .crossJoin(spark.range(720).select(F.col("id").alias("j")))
        .select(
            "ub",
            (F.col("ub") * 100000 + F.col("j")).alias("win_id"),
            (F.lit(base) + F.col("j") * 3600 + F.col("ub") * 60).alias("s"),
            (
                F.lit(base)
                + F.col("j") * 3600
                + F.col("ub") * 60
                + (F.lit(1) + (F.col("ub") + F.col("j")) % 3) * 1800
            ).alias("e"),
        )
        .localCheckpoint()
    )
    n_w = w.count()
    t0 = time.monotonic()
    n_b = range_join_bucketed(pts, w, "ub", "pt", "s", "e", 3600.0).count()
    t_b = time.monotonic() - t0
    frac = 0.005
    sample = pts.where(F.pmod(F.col("event_id"), F.lit(int(1 / frac))) == 0)
    n_s = sample.count()
    t0 = time.monotonic()
    n_naive_s = (
        sample.join(w, "ub")
        .where((F.col("s") <= F.col("pt")) & (F.col("pt") < F.col("e")))
        .count()
    )
    t_naive_s = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "range_join_bucketed_dense",
                "points": n_pts,
                "windows": n_w,
                "naive_prefilter_pairs": n_pts * n_w // 10,
                "matches_bucketed": n_b,
                "secs_bucketed_full": round(t_b, 1),
                "sample_points": n_s,
                "sample_matches": n_naive_s,
                "secs_naive_sample": round(t_naive_s, 1),
                "secs_naive_extrapolated": round(t_naive_s / frac, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--dense" in sys.argv:
        dense_section()
    else:
        main()
