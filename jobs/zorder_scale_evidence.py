"""Scale evidence for Z-order triple-table layout (plans/zorder.py).

8M synthetic triples (200k subjects × 16 predicates, column-op
synthesis, no RNG) clustered into 256 would-be files at bits=10, vs the
linear subj-sorted baseline.  The evidence is the number a 100 TB reader
cares about: how many files a min/max-pruning scan must open for
equality lookups on each dimension under each layout.  Expected shape:
linear prunes subj lookups to ~1 file but opens ALL files for pred
lookups; Z-order opens ~sqrt(F) for either dimension — the
multi-dimension trade every format's ZORDER rewrite makes.

Also reports the layout pass's own throughput (rows/s): one projection
+ one range shuffle + in-partition sort — the entire cost of the
rewrite, linear in table size.

Usage: python jobs/zorder_scale_evidence.py [--small]
Prints one JSON line for BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BITS = 10
NUM_FILES = 256


def _avg_scanned(envelopes, col, values):
    """Files a min/max reader opens for col = v, averaged over values —
    computed driver-side over the manifest-scale envelope rows."""
    hits = [
        sum(
            1
            for e in envelopes
            if e[f"{col}_min"] <= v <= e[f"{col}_max"]
        )
        for v in values
    ]
    return sum(hits) / len(hits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CI-sized smoke run")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.functions import pyoracle
    from dug_spark.plans import zorder
    from dug_spark.session import get_spark

    spark = get_spark("zorder_scale", cores=32, shuffle_partitions=64)
    n = 200_000 if args.small else 8_000_000
    n_subj = 2_000 if args.small else 200_000
    out: dict = {"rows": n, "bits": BITS, "num_files": NUM_FILES}

    sid = F.col("id")
    preds = F.array(*[F.lit(f"pred:{i}") for i in range(16)])
    trip = spark.range(n).select(
        sid.alias("row_id"),
        F.concat(F.lit("e:"), (sid % n_subj).cast("string")).alias("subj"),
        F.element_at(preds, (sid % 16 + 1).cast("int")).alias("pred"),
    )

    t0 = time.time()
    clustered = zorder.cluster_by_zorder(
        trip, ["subj", "pred"], bits=BITS, num_files=NUM_FILES
    )
    z_env = [
        r.asDict()
        for r in zorder.layout_envelopes(
            clustered, ["subj_bucket", "pred_bucket"]
        ).collect()
    ]
    wall = time.time() - t0
    out["zorder_wall_s"] = round(wall, 2)
    out["zorder_rows_per_s"] = int(n / wall)
    out["zorder_files"] = len(z_env)

    lin = (
        zorder.zorder_keys(trip, ["subj", "pred"], bits=BITS)
        .repartitionByRange(NUM_FILES, "subj_bucket")
        .sortWithinPartitions("subj_bucket")
    )
    lin_env = [
        r.asDict()
        for r in zorder.layout_envelopes(
            lin, ["subj_bucket", "pred_bucket"]
        ).collect()
    ]
    out["linear_files"] = len(lin_env)

    subj_vals = sorted(
        {pyoracle.zorder_bucket(f"e:{i}", BITS) for i in range(0, n_subj, 977)}
    )
    pred_vals = sorted(
        {pyoracle.zorder_bucket(f"pred:{i}", BITS) for i in range(16)}
    )
    for name, env in (("zorder", z_env), ("linear", lin_env)):
        out[f"{name}_files_subj_eq"] = round(
            _avg_scanned(env, "subj_bucket", subj_vals), 1
        )
        out[f"{name}_files_pred_eq"] = round(
            _avg_scanned(env, "pred_bucket", pred_vals), 1
        )
    out["pred_eq_skip_ratio"] = round(
        out["linear_files_pred_eq"] / max(out["zorder_files_pred_eq"], 1e-9), 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
