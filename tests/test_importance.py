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


# --- weighted per-group reservoir (weighted_sample_per_group) -------------


def _weighted_df(spark):
    rows = [("g1", i, float(1 + i % 7)) for i in range(200)]
    rows += [("g2", 1000 + i, 50.0 if i == 0 else 0.5) for i in range(100)]
    rows += [("g3", 2000, 3.0), ("g3", 2001, None), ("g3", 2002, -1.0)]
    return spark.createDataFrame(rows, "grp string, id long, w double")


def test_weighted_sample_matches_mirror(spark):
    df = _weighted_df(spark)
    got = [
        (r["grp"], r["id"], r["rank"])
        for r in importance.weighted_sample_per_group(
            df, "grp", "id", k=5, weight_col="w", seed=11
        ).orderBy("grp", "rank").collect()
    ]
    rows = [(g, i, w) for g, i, w in df.collect()]
    assert got == po.weighted_sample_rows(rows, k=5, seed=11)


def test_weighted_salted_two_phase_identical(spark):
    df = _weighted_df(spark)
    one = importance.weighted_sample_per_group(
        df, "grp", "id", k=5, weight_col="w", seed=11
    ).orderBy("grp", "rank").collect()
    two = importance.weighted_sample_per_group(
        df, "grp", "id", k=5, weight_col="w", seed=11, salt_factor=4
    ).orderBy("grp", "rank").collect()
    assert one == two


def test_weighted_excludes_nonpositive_and_small_groups(spark):
    got = importance.weighted_sample_per_group(
        _weighted_df(spark), "grp", "id", k=5, weight_col="w"
    )
    g3 = got.where(F.col("grp") == "g3").collect()
    # NULL and negative weights dropped; the one valid row survives rank 1
    assert [(r["id"], r["rank"]) for r in g3] == [(2000, 1)]


def test_weighted_bias_toward_heavy_rows(spark):
    # g2's id=1000 has weight 100x its siblings: across 40 seeds it must
    # be selected far more often than any single light row
    df = _weighted_df(spark)
    hits = 0
    rows = [(g, i, w) for g, i, w in df.collect()]
    for seed in range(40):
        kept = {i for g, i, _r in po.weighted_sample_rows(rows, 5, seed) if g == "g2"}
        hits += 1000 in kept
    assert hits >= 35


def test_uniform_mode_weightless(spark):
    df = _weighted_df(spark).drop("w")
    got = importance.weighted_sample_per_group(df, "grp", "id", k=3)
    rows = [(g, i, 1.0) for g, i in df.collect()]
    want = [r for r in po.weighted_sample_rows(rows, k=3)]
    assert [
        (r["grp"], r["id"], r["rank"])
        for r in got.orderBy("grp", "rank").collect()
    ] == want
