"""Scale evidence for the round-5 discovery/curation closers — sitemap +
feed parsing, page head metadata, leakage-safe splitting, compaction
planning — at ~10^6-row scale on deterministic synthetic inputs (no RNG,
resume-safe).

- parse_sitemaps / parse_feeds / page_metadata: 1.6M synthetic pages
  (column-op synthesis, same grammar as the oracle rows).  All three are
  zero-shuffle codegen maps, so the number that matters is pages/sec —
  at 10^12 pages these ride the ingest scan, and a slow parse would
  gate the whole pipeline.
- leakage_safe_split: 16M rows over ~1.6M hosts — a pure map; evidence
  is rows/sec plus the realized split fractions (md5 uniformity at
  scale) and a host-disjointness audit.
- compaction_plan: 1M files across 10k table partitions (100 files
  each) — one Exchange + per-partition FFD under applyInPandas;
  evidence is files/sec and the small-file reduction achieved.

Usage: python jobs/discovery_scale_evidence.py [--small]
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

    from dug_spark.operators import crawl, curate, weblinks
    from dug_spark.plans import compact
    from dug_spark.session import get_spark

    spark = get_spark("discovery_scale", cores=32, shuffle_partitions=64)
    out: dict = {}
    n_pages = 100_000 if args.small else 1_600_000

    d = F.col("id")
    s = F.concat(F.lit("s"), (d % 997).cast("string"))

    # ---------------- sitemap parse at n_pages ----------------
    def url_entry(k):
        e = d * 3 + F.lit(k)
        return F.concat(
            F.lit("<url>\n<loc>https://"), s, F.lit(".org/p/"),
            e.cast("string"), F.lit("</loc>"),
            F.when(
                e % 3 != 0,
                F.concat(
                    F.lit("\n<lastmod>2024-01-"),
                    F.lpad((e % 28 + 1).cast("string"), 2, "0"),
                    F.lit("</lastmod>"),
                ),
            ).otherwise(F.lit("")),
            F.lit("\n</url>"),
        )

    sitemaps = spark.range(n_pages).select(
        F.concat(F.lit("https://"), s, F.lit(".org/sm-"), d.cast("string"))
        .alias("url"),
        F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            url_entry(0), url_entry(1), url_entry(2), F.lit("</urlset>"),
        ).alias("xml"),
    )
    t0 = time.time()
    out["sitemap_entries"] = crawl.parse_sitemaps(sitemaps).count()
    out["sitemap_wall_s"] = round(time.time() - t0, 2)
    out["sitemap_pages_per_s"] = int(n_pages / (time.time() - t0))

    # ---------------- feed parse at n_pages ----------------
    def item(k):
        e = d * 2 + F.lit(k)
        return F.concat(
            F.lit("<item>\n<title>Post "), e.cast("string"),
            F.lit(" &amp; co</title>\n<link>https://"), s,
            F.lit(".org/a/"), e.cast("string"),
            F.lit("</link>\n<guid>g"), e.cast("string"),
            F.lit("</guid>\n</item>"),
        )

    feeds = spark.range(n_pages).select(
        F.concat(F.lit("https://"), s, F.lit(".org/rss-"), d.cast("string"))
        .alias("url"),
        F.concat(
            F.lit('<rss version="2.0"><channel>'), item(0), item(1),
            F.lit("</channel></rss>"),
        ).alias("xml"),
    )
    t0 = time.time()
    out["feed_entries"] = crawl.parse_feeds(feeds).count()
    out["feed_wall_s"] = round(time.time() - t0, 2)
    out["feed_pages_per_s"] = int(n_pages / (time.time() - t0))

    # ---------------- page metadata at n_pages ----------------
    pages = spark.range(n_pages).select(
        F.concat(F.lit("https://"), s, F.lit(".org/p/"), d.cast("string"))
        .alias("url"),
        F.encode(
            F.concat(
                F.lit('<html lang="en"><head><title>Page '),
                d.cast("string"),
                F.lit(' &amp; co</title><meta name="description" content="D'),
                d.cast("string"),
                F.lit('"><link rel="canonical" href="https://'), s,
                F.lit('.org/c/'), d.cast("string"),
                F.lit('"><meta name="robots" content="noindex"></head>'
                      "<body></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    t0 = time.time()
    meta = weblinks.page_metadata(pages)
    out["meta_noindex"] = meta.where(F.col("noindex")).count()
    out["meta_wall_s"] = round(time.time() - t0, 2)
    out["meta_pages_per_s"] = int(n_pages / (time.time() - t0))
    assert out["meta_noindex"] == n_pages

    # ---------------- main-content extraction at n_pages ----------------
    arts = spark.range(n_pages).select(
        F.concat(F.lit("https://"), s, F.lit(".org/a/"), d.cast("string"))
        .alias("url"),
        F.encode(
            F.concat(
                F.lit(
                    "<html><head><title>T</title></head><body>"
                    '<nav><a href="/">Home</a> <a href="/x">News</a></nav>'
                    "<article><p>"
                ),
                F.repeat(
                    F.concat(
                        F.lit("prose "),
                        F.abs(F.xxhash64(d, F.lit(9))).cast("string"),
                        F.lit(" "),
                    ),
                    8,
                ),
                F.lit(
                    '</p></article><footer><a href="/t">Terms</a></footer>'
                    "</body></html>"
                ),
            ),
            "UTF-8",
        ).alias("html"),
    )
    t0 = time.time()
    mc = weblinks.extract_main_content(arts)
    kept = mc.agg(F.sum("n_blocks_kept").alias("k")).collect()[0]["k"]
    out["content_wall_s"] = round(time.time() - t0, 2)
    out["content_pages_per_s"] = int(n_pages / (time.time() - t0))
    out["content_blocks_kept"] = kept
    assert kept == n_pages  # exactly the article paragraph per page

    # ---------------- leakage-safe split at 10x rows ----------------
    n_rows = n_pages * 10
    units = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % n_pages).cast("string"),
                 F.lit(".org")).alias("host"),
    )
    t0 = time.time()
    split = curate.leakage_safe_split(units, unit_col="host")
    fracs = {
        r["split"]: r["n_rows"]
        for r in split.groupBy("split").agg(
            F.count(F.lit(1)).alias("n_rows")
        ).collect()
    }
    out["split_wall_s"] = round(time.time() - t0, 2)
    out["split_rows_per_s"] = int(n_rows / (time.time() - t0))
    out["split_fractions"] = {
        k: round(v / n_rows, 4) for k, v in sorted(fracs.items())
    }
    mixed = (
        split.groupBy("host")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    out["split_mixed_hosts"] = mixed
    assert mixed == 0

    # ---------------- compaction planning at 1M files ----------------
    n_files = 100_000 if args.small else 1_000_000
    files = spark.range(n_files).select(
        F.concat(F.lit("dt="), (F.col("id") % 10_000).cast("string"))
        .alias("partition"),
        F.concat(F.lit("part-"), F.col("id").cast("string"),
                 F.lit(".parquet")).alias("file"),
        ((F.col("id") * 104729) % (128 * 1024 * 1024) + 1024)
        .alias("size_bytes"),
    )
    t0 = time.time()
    plan = compact.compaction_plan(files, target_bytes=512 * 1024 * 1024)
    rep = compact.compaction_report(plan).agg(
        F.sum("n_files").alias("files_in"),
        F.sum("n_files_after").alias("files_out"),
    ).collect()[0]
    out["compact_wall_s"] = round(time.time() - t0, 2)
    out["compact_files_per_s"] = int(n_files / (time.time() - t0))
    out["compact_files_in"] = rep["files_in"]
    out["compact_files_out"] = rep["files_out"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
