"""Scale evidence for the round-5 (cont. 7) alignment/curation/crawl-ops
operators at ~10^6-row scale on deterministic synthetic inputs (no RNG).

- align_entities: 400k x 400k entity snapshots, ~20k-token name vocab
  (df ≈ 40/token) PLUS two ubiquitous tokens ('www' on every name,
  'v2' on every right name).  Without the hot-token cap those two
  tokens alone contribute ~1.6·10^11 candidate pairs — the run would
  never finish; with max_token_df the join is Σ df_L·df_R over the
  surviving vocab (~3·10^7).  Evidence: wall, matched pairs (must be
  exactly 400k — every true pair is mutual-best), and the cap's
  dropped-token count.
- strip_host_boilerplate: 1.6M docs across 16k hosts (100 docs each),
  8-line bodies with 3 host-template lines.  Evidence: wall, docs/sec,
  and exact removal accounting (3 lines stripped per doc).
- allocate_budget: 1M hosts sharing 10^9 fetch slots.  Evidence: wall
  plus the two Hamilton invariants (quotas sum exactly to the budget;
  every quota within 1 of its exact share).

Usage: python jobs/align_budget_scale_evidence.py [--small]
Prints one JSON line for BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CI-sized smoke run")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark.operators import crawl, curate
    from dug_spark.operators.canonicalize import align_entities
    from dug_spark.session import get_spark

    spark = get_spark("align_budget_scale", cores=32, shuffle_partitions=64)
    out: dict = {}

    # ---------------- entity alignment at 400k x 400k ----------------
    n_ent = 40_000 if args.small else 400_000
    vocab = 2_000 if args.small else 20_000
    i = F.col("id")
    name = F.concat(
        F.lit("www t"),
        (F.abs(F.xxhash64(i, F.lit(1))) % vocab).cast("string"),
        F.lit(" t"),
        (F.abs(F.xxhash64(i, F.lit(2))) % vocab).cast("string"),
        F.lit(" k"),
        i.cast("string"),
    )
    left = spark.range(n_ent).select(i.alias("id"), name.alias("name"))
    right = spark.range(n_ent).select(
        (i + 10_000_000).alias("id"),
        F.concat(name, F.lit(" v2")).alias("name"),
    )
    t0 = time.time()
    matched = align_entities(
        left, right, min_sim=0.5, max_token_df=1_000
    ).count()
    out["align_wall_s"] = round(time.time() - t0, 2)
    out["align_matched"] = matched
    out["align_entities_per_s"] = int(2 * n_ent / (time.time() - t0))
    assert matched == n_ent, matched

    # ---------------- host boilerplate at 1.6M docs ----------------
    n_docs = 100_000 if args.small else 1_600_000
    hosts = n_docs // 100
    d = F.col("id")
    host = F.concat(F.lit("h"), (d % hosts).cast("string"), F.lit(".org"))
    body = F.concat(
        F.lit("NAV "), host, F.lit(" MENU\nHome | About | Contact\n"),
        F.lit("content "),
        F.abs(F.xxhash64(d, F.lit(3))).cast("string"),
        F.lit("\nbody line "),
        F.abs(F.xxhash64(d, F.lit(4))).cast("string"),
        F.lit("\nmore "),
        F.abs(F.xxhash64(d, F.lit(5))).cast("string"),
        F.lit("\nCopyright "), host,
    )
    docs = spark.range(n_docs).select(
        d.alias("doc_id"), host.alias("host"), body.alias("text")
    )
    t0 = time.time()
    stripped = curate.strip_host_boilerplate(docs)
    acct = stripped.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_lines_removed").alias("removed"),
        F.sum("n_lines_kept").alias("kept"),
    ).collect()[0]
    out["boiler_wall_s"] = round(time.time() - t0, 2)
    out["boiler_docs_per_s"] = int(n_docs / (time.time() - t0))
    out["boiler_removed_per_doc"] = acct["removed"] / acct["n"]
    assert acct["n"] == n_docs
    # NAV + 'Home | About | Contact' + Copyright = 3 template lines/doc
    assert acct["removed"] == 3 * n_docs, acct["removed"]
    assert acct["kept"] == 3 * n_docs

    # ---------------- budget apportionment at 1M hosts ----------------
    n_hosts = 100_000 if args.small else 1_000_000
    budget = 1_000_000_000
    hostdf = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        ((F.col("id") * 37) % 100_003 + 1).cast("double").alias("score"),
    )
    t0 = time.time()
    alloc = crawl.allocate_budget(hostdf, budget)
    checks = alloc.agg(
        F.sum("quota").alias("total"),
        F.max(F.abs(F.col("quota") - F.col("exact_share"))).alias("maxdev"),
    ).collect()[0]
    out["budget_wall_s"] = round(time.time() - t0, 2)
    out["budget_hosts_per_s"] = int(n_hosts / (time.time() - t0))
    out["budget_total"] = checks["total"]
    out["budget_max_deviation"] = round(float(checks["maxdev"]), 6)
    assert checks["total"] == budget
    assert checks["maxdev"] <= 1.0

    print(json.dumps(out))


if __name__ == "__main__":
    main()
