"""Single-pass column statistics (plans/stats.py)."""

from pyspark.sql import functions as F

from dug_spark.plans import stats


def _df(spark):
    rows = [
        (1, "aa", None),
        (2, "bb", 10.0),
        (3, "aa", 20.0),
        (None, "cc", 20.0),
    ]
    return spark.createDataFrame(rows, "k long, s string, v double")


def test_exact_stats_hand_computed(spark):
    got = {
        r.column: (r.n_rows, r.n_nulls, r.ndv, r.min_str, r.max_str, r.avg_len)
        for r in stats.collect_column_stats(_df(spark)).collect()
    }
    assert got["k"] == (4, 1, 3, "1", "3", 1.0)
    assert got["s"] == (4, 0, 3, "aa", "cc", 2.0)
    # avg_len skips nulls: ("10.0","20.0","20.0") -> 4.0
    assert got["v"] == (4, 1, 2, "10.0", "20.0", 4.0)


def test_single_pass_plan(spark):
    # exactly one aggregation over the input: the plan has no more than
    # two shuffles total (partial/final agg exchange + the explode side)
    df = stats.collect_column_stats(_df(spark), exact_ndv=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan


def test_hll_ndv_within_bound(spark):
    big = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("m")
    )
    got = {
        r.column: r.ndv
        for r in stats.collect_column_stats(big, exact_ndv=False).collect()
    }
    assert abs(got["k"] - 10_000) / 10_000 < 0.05
    assert abs(got["m"] - 997) / 997 < 0.05


def test_column_subset(spark):
    out = stats.collect_column_stats(_df(spark), columns=["s"]).collect()
    assert [r.column for r in out] == ["s"]
