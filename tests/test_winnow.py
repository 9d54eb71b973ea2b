"""Winnowing fingerprints + overlap (dedup.winnow_fingerprints/_overlap)."""

from pyspark.sql import functions as F

from dug_spark.functions import pyoracle
from dug_spark.operators import dedup

K, W = 3, 4


def _docs():
    base = "the quick brown fox jumps over the lazy dog again and again"
    return [
        (1, base),
        (2, base.replace("fox", "cat")),
        (3, "completely different words entirely here now today ok fine"),
        (4, "the quick brown fox jumps over something else entirely now"),
        (5, "tiny"),
        (6, None),
    ]


def _df(spark):
    return spark.createDataFrame(_docs(), "doc_id long, text string")


def test_matches_pure_python_mirror(spark):
    got = {
        (r.id, r.pos, r.fp)
        for r in dedup.winnow_fingerprints(_df(spark), k=K, window=W).collect()
    }
    want = set(pyoracle.winnow_rows(_docs(), K, W))
    assert got == want
    assert got  # non-trivial


def test_shared_run_guarantee(spark):
    # docs 1 and 4 share the 6-token prefix run >= k + w - 1 = 6 tokens
    # -> winnowing guarantees at least one shared fingerprint
    fps = dedup.winnow_fingerprints(_df(spark), k=K, window=W)
    a = {r.fp for r in fps.where(F.col("id") == 1).collect()}
    b = {r.fp for r in fps.where(F.col("id") == 4).collect()}
    assert a & b


def test_short_and_null_docs_yield_nothing(spark):
    fps = dedup.winnow_fingerprints(_df(spark), k=K, window=W)
    assert fps.where(F.col("id").isin(5, 6)).count() == 0


def test_overlap_scores_and_mirror(spark):
    fps = dedup.winnow_fingerprints(_df(spark), k=K, window=W)
    got = {
        (r.id_a, r.id_b, r.shared, r.overlap)
        for r in dedup.winnow_overlap(fps, min_shared=1).collect()
    }
    want = set(pyoracle.winnow_overlap_rows(_docs(), K, W, min_shared=1))
    assert got == want
    pairs = {(a, b) for a, b, _s, _o in got}
    assert (1, 2) in pairs and (1, 4) in pairs  # near-dup + shared prefix
    assert (1, 3) not in pairs  # unrelated docs share nothing


def test_overlap_max_df_drops_ubiquitous_fingerprints(spark):
    rows = [(i, "boiler plate line common everywhere") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dedup.winnow_fingerprints(df, k=K, window=W)
    assert dedup.winnow_overlap(fps, min_shared=1, max_df=3).count() == 0
    assert dedup.winnow_overlap(fps, min_shared=1).count() == 10
