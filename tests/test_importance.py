"""DSIR importance resampling (operators/importance.py): parity against
the pure-Python spec recompute (functions/pyoracle.dsir_rows), selection
semantics, and the frac-mode cutoff path."""

import pytest
from pyspark.sql import functions as F

from dug_spark.functions import pyoracle as po
from dug_spark.operators import importance


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TARGETY = [
    (i, "the quick brown fox jumps over the lazy dog again and again")
    for i in range(0, 20, 2)
]
RAWY = [(i, "zzz qqq xxx yyy www vvv uuu ttt sss rrr") for i in range(1, 20, 2)]


def test_weights_prefer_target_like_docs(spark):
    raw = _docs_df(spark, TARGETY + RAWY)
    target = _docs_df(spark, TARGETY)
    w = {
        r["doc_id"]: r["logw"]
        for r in importance.dsir_weights(raw, target, buckets=256).collect()
    }
    t_mean = sum(w[i] for i, _ in TARGETY) / len(TARGETY)
    r_mean = sum(w[i] for i, _ in RAWY) / len(RAWY)
    assert t_mean > r_mean


def test_matches_pyoracle_recompute(spark):
    raw_rows = TARGETY + RAWY + [(99, ""), (100, "the fox")]
    raw = _docs_df(spark, raw_rows)
    target = _docs_df(spark, TARGETY)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"], r["keep"])
        for r in importance.dsir_resample(
            raw, target, k=5, buckets=256
        ).collect()
    }
    exp = {
        did: (n, w, k)
        for did, n, w, k in po.dsir_rows(raw_rows, TARGETY, buckets=256, k=5)
    }
    assert set(got) == set(exp)
    for did in exp:
        assert got[did][0] == exp[did][0], did
        assert got[did][1] == pytest.approx(exp[did][1], abs=2e-5), did
        assert got[did][2] == exp[did][2], did
    assert sum(1 for v in got.values() if v[2]) == 5


def test_empty_doc_scores_zero(spark):
    raw = _docs_df(spark, [(1, ""), (2, "the fox")])
    target = _docs_df(spark, [(0, "the fox")])
    w = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in importance.dsir_weights(raw, target, buckets=64).collect()
    }
    assert w[1] == (0, 0.0)
    assert w[2][0] == 3  # 2 unigrams + 1 bigram


def test_frac_mode_keeps_roughly_half(spark):
    rows = [(i, f"word{i} word{i % 5} filler text here") for i in range(100)]
    raw = _docs_df(spark, rows)
    target = _docs_df(spark, rows[:10])
    out = importance.dsir_resample(raw, target, frac=0.5, buckets=128)
    kept = out.where("keep").count()
    assert 30 <= kept <= 70


def test_k_and_frac_are_exclusive(spark):
    df = _docs_df(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        importance.dsir_resample(df, df)
    with pytest.raises(ValueError):
        importance.dsir_resample(df, df, k=1, frac=0.5)
