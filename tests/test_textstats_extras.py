"""tf-idf keywords, deterministic mixture sampling, incremental exact
dedup (round 5): golden semantics + mirrors."""

import math

import pytest
from pyspark.sql import functions as F

from dug_spark.functions import pyoracle as po
from dug_spark.operators import dedup, textstats as ts


# ---------------------------------------------------------------------------
# tfidf_keywords


def test_tfidf_ranks_rare_terms_first(spark):
    docs = [
        (1, "apple apple banana common common"),
        (2, "banana cherry common common"),
        (3, "common common common durian"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["rk"]): (r["token"], r["tf"])
        for r in ts.tfidf_keywords(df, top_k=2).collect()
    }
    n = 3.0
    def idf(dfreq):
        return math.log((n + 1) / (dfreq + 1)) + 1
    # doc 1: apple tf=2 df=1 → 2·idf(1) beats common tf=2 df=3 and banana
    assert got[(1, 1)] == ("apple", 2)
    # doc 3: durian tf=1 df=1 vs common tf=3 df=3: 3·idf(3) ≈ 3.86 >
    # 1·idf(1) ≈ 1.69 → common wins despite being common
    assert got[(3, 1)] == ("common", 3)
    assert got[(3, 2)] == ("durian", 1)


def test_tfidf_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame([(1, "b a"), (2, "z")], "doc_id bigint, text string")
    got = [
        (r["token"], r["rk"])
        for r in ts.tfidf_keywords(df, top_k=5).where("doc_id = 1")
        .orderBy("rk").collect()
    ]
    assert got == [("a", 1), ("b", 2)]


def test_tfidf_respects_top_k(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id bigint, text string"
    )
    assert ts.tfidf_keywords(df, top_k=3).count() == 3


# ---------------------------------------------------------------------------
# sample_corpus_mix


@pytest.fixture
def mix_df(spark):
    rows = [(i, "web" if i % 2 == 0 else "forum") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_sample_mix_extremes_and_determinism(spark, mix_df):
    out = ts.sample_corpus_mix(
        mix_df, {"web": 1.0, "forum": 0.0}, group_col="source"
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert all(by[i]["keep"] for i in range(0, 400, 2))
    assert not any(by[i]["keep"] for i in range(1, 400, 2))
    # deterministic across invocations
    out2 = {r["doc_id"]: r["bucket"] for r in ts.sample_corpus_mix(
        mix_df, {"web": 1.0, "forum": 0.0}, group_col="source").collect()}
    assert out2 == {r["doc_id"]: r["bucket"] for r in out}


def test_sample_mix_monotone_under_fraction_raise(spark, mix_df):
    lo = {r["doc_id"] for r in ts.sample_corpus_mix(
        mix_df, {"web": 0.2, "forum": 0.2}, group_col="source"
    ).where("keep").collect()}
    hi = {r["doc_id"] for r in ts.sample_corpus_mix(
        mix_df, {"web": 0.6, "forum": 0.6}, group_col="source"
    ).where("keep").collect()}
    assert lo <= hi  # raising fractions only ADDS rows
    assert 0.1 < len(lo) / 400 < 0.3 and 0.45 < len(hi) / 400 < 0.75


def test_sample_mix_matches_pyoracle_mirror(spark, mix_df):
    fr = {"web": 0.3}
    got = {
        (r["doc_id"], r["bucket"], r["keep"])
        for r in ts.sample_corpus_mix(
            mix_df, fr, group_col="source", default_fraction=0.8
        ).select("doc_id", "bucket", "keep").collect()
    }
    rows = [(i, "web" if i % 2 == 0 else "forum") for i in range(400)]
    exp = set(po.sample_mix_rows(rows, fr, default_fraction=0.8))
    assert got == exp


# ---------------------------------------------------------------------------
# exact_dedup_incremental


def test_incremental_dedup_verdicts(spark):
    seen_docs = spark.createDataFrame(
        [(1, "old text"), (2, "other old")], "doc_id bigint, text string"
    )
    seen = seen_docs.select(
        F.md5(F.encode("text", "utf-8")).alias("fp")
    )
    batch = spark.createDataFrame(
        [
            (10, "old text"),      # dup of seen
            (11, "fresh one"),     # new, first in batch
            (12, "fresh one"),     # within-batch dup of 11
            (13, "another fresh"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in
           dedup.exact_dedup_incremental(batch, seen).collect()}
    assert got[10]["dup_of_seen"] and not got[10]["keep"]
    assert not got[11]["dup_of_seen"] and got[11]["keep"]
    assert not got[12]["dup_of_seen"] and not got[12]["keep"]
    assert got[13]["keep"]
    # appending kept fps to seen makes a re-run of the same batch all-dup
    seen2 = seen.unionByName(
        batch.join(
            dedup.exact_dedup_incremental(batch, seen).where("keep")
            .select("doc_id"), "doc_id", "left_semi"
        ).select(F.md5(F.encode("text", "utf-8")).alias("fp"))
    )
    rerun = dedup.exact_dedup_incremental(batch, seen2)
    assert rerun.where("keep").count() == 0


def test_incremental_dedup_null_text(spark):
    seen = spark.createDataFrame([("x",)], "fp string").limit(0)
    batch = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["keep"] for r in
           dedup.exact_dedup_incremental(batch, seen).collect()}
    assert got == {1: True, 2: False}


# --- temperature mixture fractions -------------------------------------------


def test_temperature_fractions_hand_computed(spark):
    from dug_spark.operators.textstats import temperature_fractions

    rows = [("big",)] * 900 + [("small",)] * 100
    df = spark.createDataFrame(rows, "source string")
    got = {
        r["source"]: (r["mass"], r["p_target"], r["fraction"])
        for r in temperature_fractions(df, temperature=2.0, budget_frac=0.5).collect()
    }
    import math

    ptot = math.sqrt(900) + math.sqrt(100)
    p_big, p_small = math.sqrt(900) / ptot, math.sqrt(100) / ptot
    assert got["big"] == (900.0, round(p_big, 6), round(p_big * 0.5 * 1000 / 900, 6))
    # small's uncapped share would be 1.25 of its own size -> capped at 1
    assert got["small"] == (100.0, round(p_small, 6), 1.0)
    # T=2 upweights the tail: small's share rises from 10% to 25%
    assert abs(p_small - 0.25) < 1e-9


def test_temperature_limits(spark):
    from dug_spark.operators.textstats import temperature_fractions

    rows = [("a",)] * 800 + [("b",)] * 200
    df = spark.createDataFrame(rows, "source string")
    # T=1: natural proportions
    t1 = {r["source"]: r["p_target"] for r in
          temperature_fractions(df, temperature=1.0).collect()}
    assert t1 == {"a": 0.8, "b": 0.2}
    # huge T: near-uniform, and the tail group's fraction caps at 1
    t9 = {r["source"]: (r["p_target"], r["fraction"]) for r in
          temperature_fractions(df, temperature=1e9, budget_frac=1.0).collect()}
    assert abs(t9["a"][0] - 0.5) < 1e-6 and abs(t9["b"][0] - 0.5) < 1e-6
    assert t9["b"][1] == 1.0  # cap: can't sample 500 rows from a 200-row group


def test_corpus_profile_approx_within_rank_error(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import textstats as ts

    # lengths 1..2000 in one group: p50 exact = 1000.5, p95 = 1900.05
    df = spark.range(1, 2001).select(
        F.lit("g").alias("lang"), F.repeat(F.lit("x"), F.col("id").cast("int")).alias("text")
    )
    exact = ts.corpus_profile(df).collect()[0]
    approx = ts.corpus_profile(df, approx=True, accuracy=10_000).collect()[0]
    # GK guarantees a value whose RANK is within n/accuracy of the
    # target; for this uniform ramp that is a tight value bound too
    assert abs(approx.p50_chars - exact.p50_chars) <= 2
    assert abs(approx.p95_chars - exact.p95_chars) <= 2
    assert approx.n_docs == exact.n_docs == 2000
    assert approx.total_chars == exact.total_chars
