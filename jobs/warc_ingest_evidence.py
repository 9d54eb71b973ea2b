"""End-to-end crawl-container evidence: WARC segments → corpus →
annotate → triples, at adversarial record counts.

Phase 0 (untimed): synthesize N `.warc` segments on local disk the way a
fetcher lands them — DISTRIBUTED, each task builds whole segments from
its slice of the replicated documents table and writes them itself (the
driver never sees record bytes).
Phase 1 (timed): `read_warc` (binaryFile scan → mapInPandas byte-walk)
→ `warc_to_corpus` (HTTP-200 text/html filter + byte-identical text
extraction) → corpus row count.
Phase 2 (timed): the KG pipeline over that corpus (annotate → concepts →
triples) + ontology closure of the subclass edge table
(graph.transitive_closure).

Usage: python jobs/warc_ingest_evidence.py [--replicate 64] [--segments 64]
Prints one JSON line for BASELINE.md / SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=64)
    ap.add_argument("--segments", type=int, default=64)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dug_spark import fixtures
    from dug_spark.operators import graph
    from dug_spark.pipeline import Pipeline
    from dug_spark.session import get_spark
    from dug_spark.sources import warc_parser as wp

    spark = get_spark("warc_evidence", cores=args.cores, shuffle_partitions=64)
    work = tempfile.mkdtemp(prefix="warc_evidence_")
    seg_dir = os.path.join(work, "segments")
    os.makedirs(seg_dir)
    out: dict = {"replicate": args.replicate, "segments": args.segments}

    # phase 0 (untimed): land segments distributed — one file per task
    docs = (
        spark.range(args.replicate)
        .select(F.col("id").alias("rep"))
        .crossJoin(spark.read.parquet(f"{SF}/documents.parquet"))
        .select(
            (F.col("rep") * 1_000_000 + F.col("doc_id")).alias("rid"),
            "text",
        )
        .repartition(args.segments, "rid")
    )

    def write_segment(batches):
        import pandas as pd

        recs, rid0 = [], None
        for pdf in batches:
            for _, r in pdf.iterrows():
                rid = int(r["rid"])
                rid0 = rid if rid0 is None else rid0
                payload = (
                    "<html><body><p>" + (r["text"] or "") + "</p></body></html>"
                ).encode("utf-8")
                recs.append(
                    wp.build_warc_record(
                        f"https://h{rid % 1000}.example.org/d/{rid}",
                        "2024-01-01T00:00:00Z",
                        payload,
                    )
                )
        if not recs:
            yield pd.DataFrame({"path": pd.Series([], dtype="object"),
                                "n": pd.Series([], dtype="int64")})
            return
        path = os.path.join(seg_dir, f"seg-{rid0}.warc")
        with open(path, "wb") as f:
            f.write(b"".join(recs))
        yield pd.DataFrame({"path": [path], "n": [len(recs)]})

    landed = docs.mapInPandas(write_segment, schema="path string, n long")
    out["n_records"] = int(landed.agg(F.sum("n")).collect()[0][0] or 0)
    out["n_segments"] = len(os.listdir(seg_dir))

    # phase 1 (timed): WARC → corpus
    t0 = time.time()
    corpus = wp.warc_to_corpus(wp.read_warc(spark, seg_dir + "/*.warc"))
    corpus_path = os.path.join(work, "corpus")
    corpus.write.mode("overwrite").parquet(corpus_path)
    out["t_warc_to_corpus_s"] = round(time.time() - t0, 1)
    corpus = spark.read.parquet(corpus_path)
    out["corpus_rows"] = corpus.count()
    out["warc_docs_per_s"] = round(
        out["corpus_rows"] / out["t_warc_to_corpus_s"]
    )

    # phase 2 (timed): corpus → triples + subclass closure
    t1 = time.time()
    pipe = Pipeline(
        dictionary=fixtures.vocab_dictionary(spark),
        curie_norm=fixtures.vocab_norm(spark),
        kg_edges=fixtures.vocab_kg_edges(spark),
        use_extracted_html=False,  # text column already extracted in phase 1
    )
    res = pipe.run(corpus.withColumn("lang", F.lit("en")))
    out["triples"] = res.triples.count()
    closure = graph.transitive_closure(
        fixtures.vocab_kg_edges(spark)
        .where(F.col("predicate") == "biolink:subclass_of")
        .select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    )
    out["closure_rows"] = closure.count()
    out["t_pipeline_s"] = round(time.time() - t1, 1)
    out["pipeline_docs_per_s"] = round(out["corpus_rows"] / out["t_pipeline_s"])

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
