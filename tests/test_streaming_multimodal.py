"""Streaming ingest (AvailableNow + checkpoint resume) and multimodal
plumbing tests."""

import pytest
from pyspark.sql import functions as F

from dug_spark import fixtures
from dug_spark.operators import multimodal
from dug_spark.pipeline import Pipeline
from dug_spark.streaming.ingest import stream_corpus_to_triples, windowed_event_counts

SF = "/root/testdata/sf0.001"


def test_stream_corpus_availablenow_exactly_once(spark, tmp_path):
    corpus = fixtures.corpus_from_documents(spark, SF).limit(60)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    corpus.write.mode("overwrite").parquet(in_dir)
    pipe = Pipeline(
        dictionary=fixtures.vocab_dictionary(spark),
        curie_norm=fixtures.vocab_norm(spark),
    )
    stream_corpus_to_triples(spark, in_dir, out_dir, ckpt, pipe)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0
    # re-run with nothing new: checkpoint makes it a no-op (exact resume)
    stream_corpus_to_triples(spark, in_dir, out_dir, ckpt, pipe)
    assert spark.read.parquet(out_dir).count() == n1
    # append new files: only the delta is processed
    extra = spark.createDataFrame(
        [
            ("https://example.org/doc/late1", None, None, "the hash join and window beat sort merge", "en"),
            ("https://example.org/doc/late2", None, None, "stream filter scan", "en"),
        ],
        corpus.schema,
    )
    extra.write.mode("append").parquet(in_dir)
    stream_corpus_to_triples(spark, in_dir, out_dir, ckpt, pipe)
    out = spark.read.parquet(out_dir)
    n3 = out.count()
    assert n3 > n1
    assert out.where(F.col("subj").contains("late1")).count() > 0


def test_windowed_event_counts_batch_parity(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = windowed_event_counts(ev, window="1 hour")
    rows = out.collect()
    assert sum(r["n"] for r in rows) == ev.count()


def test_multimodal_feature_extraction(spark):
    media = multimodal.synthetic_media(spark, n=12)
    feats = multimodal.extract_features(media, deterministic_fake=True).collect()
    assert len(feats) == 12
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic: same payload → same features
    again = multimodal.extract_features(
        multimodal.synthetic_media(spark, n=12), deterministic_fake=True
    ).collect()
    assert {r["media_id"]: tuple(r["features"]) for r in feats} == {
        r["media_id"]: tuple(r["features"]) for r in again
    }


def test_multimodal_decode_stub_raises(spark):
    media = multimodal.synthetic_media(spark, n=2)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        multimodal.extract_features(media, deterministic_fake=False).collect()


def test_multimodal_frame_sampling(spark):
    media = multimodal.synthetic_media(spark, n=9)
    vids = media.where(F.col("mime") == "video/mp4")
    frames = multimodal.sample_frames(vids, every_ms=1000, deterministic_fake=True)
    rows = frames.collect()
    # 3000ms / 1000ms = 3 frames per video
    per = {}
    for r in rows:
        per[r["media_id"]] = per.get(r["media_id"], 0) + 1
    assert all(v == 3 for v in per.values())


def test_multimodal_resize(spark):
    media = multimodal.synthetic_media(spark, n=6).where(
        F.col("mime") == "image/png"
    )
    out = multimodal.resize_images(media, 32, 32, deterministic_fake=True).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)
