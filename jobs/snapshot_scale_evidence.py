"""SnapshotTable scale evidence: an incremental triple-materialization
chain at ~1.6M rows — 16 partitioned appends of 100k synthetic triples
each (the daily-crawl-increment shape), then time travel and retention.

Checks and reports:
- per-append commit wall (data write + log record; the log record is
  snapshot-count-sized, so commit overhead must stay FLAT as the table
  grows — the property that separates a commit log from rewrite-on-append);
- read(current) row count after the chain, and read_as_of() at the
  4th snapshot (time-travel correctness at depth);
- a pred-filtered read's file count vs the full scan (partition pruning
  through the union of 16 partitioned snapshot dirs);
- expire_snapshots(keep_last=2): snapshots dropped, dirs GC'd, current
  read unchanged.

Usage: python jobs/snapshot_scale_evidence.py [--rows 1600000 --appends 16]
Prints one JSON line for BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_600_000)
    ap.add_argument("--appends", type=int, default=16)
    ap.add_argument("--root", default="/dev/shm/snap_scale_evidence")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.plans.snapshots import SnapshotTable
    from dug_spark.session import get_spark

    spark = get_spark("snap_scale", cores=32, shuffle_partitions=32)
    per = args.rows // args.appends
    preds = ["HAS_CONCEPT", "biolink:subclass_of", "co_mentioned_with"]

    if os.path.exists(args.root):
        shutil.rmtree(args.root)
    t = SnapshotTable(args.root)

    walls = []
    snap_ids = []
    for b in range(args.appends):
        batch = spark.range(b * per, (b + 1) * per).select(
            F.concat(F.lit("E:"), F.col("id").cast("string")).alias("subj"),
            F.element_at(
                F.array(*[F.lit(p) for p in preds]),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("pred"),
            F.concat(F.lit("C:"), (F.col("id") % 997).cast("string")).alias("obj"),
        )
        t0 = time.monotonic()
        snap_ids.append(t.append(batch, partition_by=["pred"]))
        walls.append(round(time.monotonic() - t0, 2))

    cur = t.read(spark)
    n_cur = cur.count()
    n_asof4 = t.read_as_of(spark, snap_ids[3]).count()
    filtered = cur.where(F.col("pred") == "biolink:subclass_of")
    n_filtered = filtered.count()

    def scanned_files(df):
        return df.select(F.input_file_name()).distinct().count()

    files_full = scanned_files(cur)
    files_pruned = scanned_files(filtered)

    # merge-on-read churn: tombstone ~1% of subjects and append their
    # re-extracted rows in ONE delta commit (the recrawl increment); the
    # evidence is (a) the delta commit cost is churn-sized, (b) the
    # tombstoned read pays only a broadcast join (wall vs pre-delta read),
    # (c) compact() restores the tombstone-free read.
    t_read0 = time.monotonic()
    n_cur2 = t.read(spark).count()
    read_plain_wall = round(time.monotonic() - t_read0, 2)
    churn = cur.select("subj").distinct().where(
        F.abs(F.xxhash64("subj")) % 100 == 0
    )
    renewed = cur.join(churn, on="subj", how="left_semi").withColumn(
        "obj", F.concat(F.col("obj"), F.lit("_v2"))
    )
    t0 = time.monotonic()
    t.delta(renewed, churn, partition_by=["pred"])
    delta_wall = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    n_after_delta = t.read(spark).count()
    read_mor_wall = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    t.compact(spark, partition_by=["pred"])
    compact_wall = round(time.monotonic() - t0, 2)
    n_after_compact = t.read(spark).count()
    n_churn = churn.count()

    expired = t.expire_snapshots(spark, keep_last=2)
    n_after_expire = t.read(spark).count()
    dirs_left = sum(
        1 for d in os.listdir(args.root) if d.startswith("snap-")
    )

    out = {
        "rows": args.rows,
        "appends": args.appends,
        "append_wall_s": walls,
        "append_wall_first4_mean": round(sum(walls[:4]) / 4, 2),
        "append_wall_last4_mean": round(sum(walls[-4:]) / 4, 2),
        "current_rows": n_cur,
        "as_of_snapshot4_rows": n_asof4,
        "pred_filtered_rows": n_filtered,
        "files_full_scan": files_full,
        "files_pruned_scan": files_pruned,
        "churn_keys": n_churn,
        "delta_commit_wall_s": delta_wall,
        "read_plain_wall_s": read_plain_wall,
        "read_mor_wall_s": read_mor_wall,
        "rows_after_delta": n_after_delta,
        "compact_wall_s": compact_wall,
        "rows_after_compact": n_after_compact,
        "read_rows_recheck": n_cur2,
        "expired": expired,
        "rows_after_expire": n_after_expire,
        "data_dirs_after_expire": dirs_left,
    }
    shutil.rmtree(args.root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
