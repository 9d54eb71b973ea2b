"""As-of join and bucketed range join (operators/temporal.py)."""

import pytest
from pyspark.sql import functions as F

from dug_spark.operators import temporal


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 5.0, "b"), (1, 3.0, "c"), (2, 7.0, "d"), (3, 1.0, "e")],
        "k long, t double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8.0, 100.0), (1, 3.0, 50.0), (1, 3.0, 60.0), (2, 7.0, 70.0)],
        "k long, rt double, v double",
    )
    return left, right


def _naive_asof(left_rows, right_rows, tol=None):
    # dedup right per (k, ts): max payload
    dr = {}
    for k, rt, v in right_rows:
        dr[(k, rt)] = max(dr.get((k, rt), float("-inf")), v)
    out = {}
    for k, t, tag in left_rows:
        cands = [(rt, v) for (rk, rt), v in dr.items() if rk == k and rt <= t]
        if cands:
            rt, v = max(cands)
            if tol is not None and t - rt > tol:
                rt, v = None, None
        else:
            rt, v = None, None
        out[(k, t, tag)] = (v, rt)
    return out


def test_asof_matches_naive(spark, sides):
    left, right = sides
    got = {
        (r["k"], r["t"], r["tag"]): (r["v"], r["matched_ts"])
        for r in temporal.asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    }
    want = _naive_asof(
        [(r["k"], r["t"], r["tag"]) for r in left.collect()],
        [(r["k"], r["rt"], r["v"]) for r in right.collect()],
    )
    assert got == want
    # spot semantics: tie at equal ts matches (k=2 t=7 rt=7); (1,3) dedups
    # to the max payload 60; k=3 has no right rows -> NULLs
    assert got[(2, 7.0, "d")] == (70.0, 7.0)
    assert got[(1, 3.0, "c")] == (60.0, 3.0)
    assert got[(3, 1.0, "e")] == (None, None)


def test_asof_tolerance_voids_stale(spark, sides):
    left, right = sides
    got = {
        (r["k"], r["t"]): (r["v"], r["matched_ts"])
        for r in temporal.asof_join(
            left, right, "k", "t", "rt", ["v"], tolerance_seconds=1.5
        ).collect()
    }
    assert got[(1, 10.0)] == (None, None)  # latest prior rt=8, age 2 > 1.5
    assert got[(1, 5.0)] == (None, None)  # latest prior rt=3, age 2 > 1.5
    assert got[(2, 7.0)] == (70.0, 7.0)  # age 0
    assert got[(1, 3.0)] == (60.0, 3.0)  # age 0, deduped to max payload


def test_asof_one_shuffle_no_join(spark, sides):
    left, right = sides
    plan = (
        temporal.asof_join(left, right, "k", "t", "rt", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union+window, not a join


def test_range_join_bucketed_matches_naive(spark):
    left = spark.createDataFrame(
        [(k, float(p)) for k in (1, 2) for p in range(0, 50, 3)],
        "k long, p double",
    )
    right = spark.createDataFrame(
        [(1, 0.0, 10.0, "w1"), (1, 9.0, 30.0, "w2"), (2, 5.0, 6.0, "w3"),
         (1, 40.0, 40.0, "empty"), (2, 20.0, 49.0, "w4")],
        "k long, s double, e double, win string",
    )
    for width in (1.0, 4.0, 16.0, 100.0):
        got = {
            (r["k"], r["p"], r["win"])
            for r in temporal.range_join_bucketed(
                left, right, "k", "p", "s", "e", width
            ).collect()
        }
        want = {
            (r["k"], r["p"], r["win"])
            for r in left.join(right, "k")
            .where((F.col("s") <= F.col("p")) & (F.col("p") < F.col("e")))
            .collect()
        }
        assert got == want, width


def test_sessionize_gap_rule(spark):
    rows = [
        (1, 0.0), (1, 10.0), (1, 100.0), (1, 105.0), (1, 300.0),
        (2, 5.0), (2, 5.0),  # equal-ts tie: same session, same seq
    ]
    df = spark.createDataFrame(rows, "k long, t double")
    got = {
        (r["k"], r["t"], r["session_seq"])
        for r in temporal.sessionize(df, "k", "t", gap_seconds=50.0).collect()
    }
    assert got == {
        (1, 0.0, 1), (1, 10.0, 1), (1, 100.0, 2), (1, 105.0, 2), (1, 300.0, 3),
        (2, 5.0, 1), (2, 5.0, 1),
    }


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, t double")
    plan = (
        temporal.sessionize(df, "k", "t", 10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
