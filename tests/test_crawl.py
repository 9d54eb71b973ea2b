"""Crawl-snapshot temporal analytics (operators/crawl.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dug_spark.operators import crawl


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def captures(spark):
    rows = [
        # u1: three captures, one content change at t3
        ("https://a.example/x", _ts("2020-01-01 00:00:00"), "alpha v1"),
        ("https://a.example/x", _ts("2020-01-02 00:00:00"), "alpha v1"),
        ("https://a.example/x", _ts("2020-01-03 00:00:00"), "alpha v2"),
        # u2: single capture — no transition observable
        ("https://b.example/y", _ts("2020-01-01 12:00:00"), "beta"),
        # u3: flip-flops back to an old version (2 changes, 2 versions)
        ("https://c.example/z", _ts("2020-01-01 00:00:00"), "g1"),
        ("https://c.example/z", _ts("2020-01-05 00:00:00"), "g2"),
        ("https://c.example/z", _ts("2020-01-09 00:00:00"), "g1"),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")


def test_capture_history_flags(captures):
    hist = crawl.capture_history(captures).orderBy("url", "warc_ts").collect()
    by_url = {}
    for r in hist:
        by_url.setdefault(r["url"], []).append(r["changed"])
    assert by_url["https://a.example/x"] == [None, False, True]
    assert by_url["https://b.example/y"] == [None]
    assert by_url["https://c.example/z"] == [None, True, True]


def test_churn_summary(captures):
    rows = {r["url"]: r for r in crawl.snapshot_churn(captures).collect()}
    a = rows["https://a.example/x"]
    assert (a["n_captures"], a["n_changes"], a["n_versions"]) == (3, 1, 2)
    assert a["change_ratio"] == 0.5
    assert a["last_epoch"] - a["first_epoch"] == 2 * 86400
    assert a["mean_change_secs"] == 2 * 86400.0

    b = rows["https://b.example/y"]
    assert (b["n_captures"], b["n_changes"], b["n_versions"]) == (1, 0, 1)
    assert b["change_ratio"] is None  # no transition observable
    assert b["mean_change_secs"] is None  # no change ever observed

    c = rows["https://c.example/z"]
    # returning to an old version is still a transition both times
    assert (c["n_captures"], c["n_changes"], c["n_versions"]) == (3, 2, 2)
    assert c["change_ratio"] == 1.0
    assert c["mean_change_secs"] == 4 * 86400.0


def test_null_text_is_a_version(spark):
    rows = [
        ("u", _ts("2020-01-01 00:00:00"), "x"),
        ("u", _ts("2020-01-02 00:00:00"), None),
        ("u", _ts("2020-01-03 00:00:00"), None),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    r = crawl.snapshot_churn(df).collect()[0]
    # NULL text hashes to the seed constant: one transition into it,
    # none between the two NULL captures
    assert (r["n_changes"], r["n_versions"]) == (1, 2)


def test_churn_single_shuffle(captures):
    """The lag window and the per-url aggregate share ONE url-keyed
    exchange — EnsureRequirements must reuse the window's hash
    partitioning for the groupBy (the 100 TB contract in the module
    docstring)."""
    plan = crawl.snapshot_churn(captures)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_custom_hash_expr(captures):
    hist = crawl.capture_history(captures, hash_expr=F.md5(F.coalesce("text", F.lit(""))))
    row = hist.where(F.col("url") == "https://b.example/y").collect()[0]
    import hashlib

    assert row["content_hash"] == hashlib.md5(b"beta").hexdigest()
