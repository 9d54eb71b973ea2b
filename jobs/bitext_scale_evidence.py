"""Scale evidence for margin-based bitext mining (similarity.
margin_bitext / margin_bitext_blocked).

Deterministic synthetic embedding spaces (golden-ratio quasi-random
components, no RNG): tgt_i is src_i perturbed by ~0.02 per component
(the planted translation), plus 25% extra tgt-only distractors.

- exact path, 4k × 5k: the quadratic reference — wall + planted-pair
  recall (every planted pair should win its mutual argmax).
- blocked path, 40k × 50k: grid-cell blocker on the first two
  components (the cheapest LSH family) → candidate pairs ≈ 1/cells of
  the cross product → same margin algebra.  Evidence: candidate
  reduction ratio, wall, planted-pair recall ≥ exact-path ballpark.

The claim measured is the scaling story, not a benchmark trick: the
exact path is O(|src|·|tgt|) and the blocked path is O(candidates),
with recall degrading only by the blocker's collision probability —
at ccMatrix scale (10^9 × 10^9) only the blocked path exists.

Usage: python jobs/bitext_scale_evidence.py [--small]
Prints one JSON line for BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = 16
PHI = 0.6180339887498949


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import similarity as sim
    from dug_spark.session import get_spark

    spark = get_spark("bitext_scale", cores=32, shuffle_partitions=64)
    n_exact = 500 if args.small else 4_000
    n_block = 4_000 if args.small else 40_000
    out: dict = {"dims": DIMS}

    def unit(idcol, salt: int):
        # decorrelated uniform in [0,1): xxhash64(id, d, salt) scaled
        return [
            (
                F.pmod(F.xxhash64(idcol, F.lit(d), F.lit(salt)), F.lit(10**9))
                / 1e9
            )
            for d in range(DIMS)
        ]

    def vec(idcol, perturb: float, salt: int = 0):
        base = unit(idcol, salt)
        noise = unit(idcol, 1000 + salt)
        comps = []
        for b, nz in zip(base, noise):
            x = b + perturb * nz
            comps.append((2.0 * x - 1.0).cast("float"))
        return F.array(*comps)

    def spaces(n):
        sid = F.col("id")
        src = spark.range(n).select(
            F.col("id").alias("vec_id"), vec(sid, 0.0).alias("embedding")
        )
        tgt_true = spark.range(n).select(
            F.col("id").alias("vec_id"), vec(sid, 0.02).alias("embedding")
        )
        extra = spark.range(n, n + n // 4).select(
            F.col("id").alias("vec_id"), vec(sid, 0.0, salt=7).alias("embedding")
        )
        return src, tgt_true.unionByName(extra)

    def recall(pairs_df, n):
        hits = pairs_df.where(F.col("src_id") == F.col("tgt_id")).count()
        return round(hits / n, 4)

    # exact quadratic reference
    src, tgt = spaces(n_exact)
    t0 = time.time()
    exact = sim.margin_bitext(src, tgt, k=4, threshold=1.0).localCheckpoint(
        eager=True
    )
    out["exact_n"] = n_exact
    out["exact_wall_s"] = round(time.time() - t0, 2)
    out["exact_pairs"] = exact.count()
    out["exact_recall"] = recall(exact, n_exact)

    # blocked path at 10× the rows
    src, tgt = spaces(n_block)

    def cells(df, side, offset):
        # offset grids = multi-probe: a planted pair split by one grid's
        # cell boundary still collides in the half-cell-shifted grid
        e = F.col("embedding")
        cell = (
            F.floor((e.getItem(0) + 1.0) * 4.0 + offset) * 90
            + F.floor((e.getItem(1) + 1.0) * 4.0 + offset)
        ).alias("cell")
        return df.select(F.col("vec_id").alias(f"{side}_id"), cell)

    t0 = time.time()
    cands = (
        cells(src, "src", 0.0)
        .join(cells(tgt, "tgt", 0.0), "cell")
        .unionByName(
            cells(src, "src", 0.5).join(cells(tgt, "tgt", 0.5), "cell")
        )
        .select("src_id", "tgt_id")
    )
    blocked = sim.margin_bitext_blocked(
        src, tgt, cands, k=4, threshold=1.0
    ).localCheckpoint(eager=True)
    out["blocked_n"] = n_block
    out["blocked_wall_s"] = round(time.time() - t0, 2)
    out["blocked_candidates"] = cands.count()
    out["cross_product"] = n_block * (n_block + n_block // 4)
    out["candidate_reduction"] = round(
        out["cross_product"] / max(out["blocked_candidates"], 1), 1
    )
    out["blocked_pairs"] = blocked.count()
    out["blocked_recall"] = recall(blocked, n_block)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
