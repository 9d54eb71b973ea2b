"""ES significant_terms / JLH aggregation (search.significant_terms)."""

import pytest

from dug_spark.operators import search


def _docs(spark):
    rows = [
        (0, True, "marker common alpha"),
        (1, True, "marker common beta"),
        (2, True, "marker common gamma"),
        (3, False, "common alpha"),
        (4, False, "common beta"),
        (5, False, "common gamma"),
        (6, False, "common delta"),
        (7, False, "common delta"),
        (8, False, "common delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, fg boolean, text string")


def test_jlh_scores_hand_computed(spark):
    got = {
        r.term: (r.fg_df, r.bg_df, r.jlh)
        for r in search.significant_terms(
            _docs(spark), subset_col="fg", min_doc_count=1, top_n=10
        ).collect()
    }
    # marker: fg 3/3=1.0, bg 3/9=1/3 -> jlh = (1-1/3)*(1/(1/3)) = 2.0
    assert got["marker"] == (3, 3, 2.0)
    # common appears everywhere: fg% == bg% -> filtered out
    assert "common" not in got
    # alpha: fg 1/3, bg 2/9 -> (1/3-2/9)*(1/3 / (2/9)) = 1/6
    assert got["alpha"] == (1, 2, round(1 / 6, 6))
    # delta: fg 0 -> fg% < bg% -> filtered
    assert "delta" not in got


def test_min_doc_count_gate(spark):
    got = {
        r.term
        for r in search.significant_terms(
            _docs(spark), subset_col="fg", min_doc_count=3, top_n=10
        ).collect()
    }
    assert got == {"marker"}  # alpha/beta/gamma have fg_df 1


def test_doc_frequency_semantics(spark):
    # a term repeated inside one doc counts once
    rows = [(0, True, "echo echo echo"), (1, False, "other")]
    df = spark.createDataFrame(rows, "doc_id long, fg boolean, text string")
    got = {
        r.term: r.fg_df
        for r in search.significant_terms(
            df, subset_col="fg", min_doc_count=1, top_n=10
        ).collect()
    }
    assert got["echo"] == 1


def test_empty_foreground_raises(spark):
    rows = [(0, False, "alpha")]
    df = spark.createDataFrame(rows, "doc_id long, fg boolean, text string")
    with pytest.raises(ValueError):
        search.significant_terms(df, subset_col="fg")
