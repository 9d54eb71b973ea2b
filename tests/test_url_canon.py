"""URL canonicalization (textstats.canonical_url) goldens."""

import pytest

from dug_spark.operators import textstats as ts

CASES = [
    # fragment + case + default port + www + tracking + param sort + slash
    (
        "https://WWW.Example.ORG:443/A/b/?utm_source=x&b=2&a=1#frag",
        "https://example.org/A/b?a=1&b=2",
    ),
    ("http://example.org:80/a", "http://example.org/a"),
    ("https://example.org/a/?fbclid=zzz", "https://example.org/a"),
    ("http://example.org/p?z=1&y=2&utm_campaign=c", "http://example.org/p?y=2&z=1"),
    ("https://www.example.org/", "https://example.org"),
    # non-default port survives; path case survives
    ("http://example.org:8080/Q?a=1", "http://example.org:8080/Q?a=1"),
    # :80 on https is NOT default — survives
    ("https://example.org:80/a", "https://example.org:80/a"),
    # only-tracking query collapses to no query at all
    ("http://example.org/x?utm_medium=m&gclid=g", "http://example.org/x"),
    # root URL with port
    ("http://example.org:80", "http://example.org"),
]


@pytest.mark.parametrize("url,want", CASES)
def test_canonical_url_goldens(spark, url, want):
    df = spark.createDataFrame([(url,)], "url string")
    got = ts.canonical_url(df).collect()[0]["canon_url"]
    assert got == want


def test_canonical_idempotent(spark):
    urls = [(u,) for u, _w in CASES]
    df = spark.createDataFrame(urls, "url string")
    once = ts.canonical_url(df).select(
        ts.F.col("canon_url").alias("url")
    )
    twice = ts.canonical_url(once).collect()
    assert all(r["url"] == r["canon_url"] for r in twice)
