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


# ---------------------------------------------------------- triple_validity

def _validity_mirror(obs):
    """obs: list of (subj, pred, obj, ts). Returns set of
    (subj, pred, obj, valid_from, valid_to, n_snapshots, is_current)."""
    timeline = sorted({ts for *_k, ts in obs})
    sidx = {ts: i for i, ts in enumerate(timeline)}
    per = {}
    for s, p, o, ts in obs:
        per.setdefault((s, p, o), set()).add(sidx[ts])
    out = set()
    for key, idxs in per.items():
        run = []
        for i in sorted(idxs):
            if run and i != run[-1] + 1:
                out.add(
                    key
                    + (
                        timeline[run[0]],
                        timeline[run[-1]],
                        len(run),
                        run[-1] == len(timeline) - 1,
                    )
                )
                run = []
            run.append(i)
        out.add(
            key
            + (
                timeline[run[0]],
                timeline[run[-1]],
                len(run),
                run[-1] == len(timeline) - 1,
            )
        )
    return out


def test_triple_validity_islands(spark):
    from datetime import datetime

    t = lambda d: datetime(2020, 9, d)
    obs = [
        # continuous run, still current at snapshot 4
        ("a", "P", "x", t(1)), ("a", "P", "x", t(2)),
        ("a", "P", "x", t(3)), ("a", "P", "x", t(4)),
        # two islands with a gap at snapshot 3
        ("b", "P", "y", t(1)), ("b", "P", "y", t(2)), ("b", "P", "y", t(4)),
        # single stale observation
        ("c", "Q", "z", t(2)),
        # duplicate observation within one snapshot collapses
        ("c", "Q", "z", t(2)),
    ]
    df = spark.createDataFrame(
        obs, "subj string, pred string, obj string, warc_ts timestamp"
    )
    got = {
        (
            r["subj"], r["pred"], r["obj"], r["valid_from"], r["valid_to"],
            r["n_snapshots"], r["is_current"],
        )
        for r in crawl.triple_validity(df).collect()
    }
    assert got == _validity_mirror(obs)
    # b has exactly two intervals; only the later one is current
    b_rows = sorted(x for x in got if x[0] == "b")
    assert len(b_rows) == 2
    assert [x[6] for x in b_rows] == [False, True]
    # c's lone interval is stale
    assert [x for x in got if x[0] == "c"][0][6] is False


def test_triple_validity_single_snapshot(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [("a", "P", "x", datetime(2020, 1, 1))],
        "subj string, pred string, obj string, warc_ts timestamp",
    )
    rows = crawl.triple_validity(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_snapshots"] == 1 and r["is_current"] is True
    assert r["valid_from"] == r["valid_to"]


# --- robots.txt compliance (crawl.robots_filter) ---------------------------


RULES = [
    # host a: '*' group exercising longest-match, tie→allow, '$', '*'
    ("a.org", "*", "disallow", "/p1"),
    ("a.org", "*", "allow", "/p1/ok"),
    ("a.org", "*", "disallow", "/x9$"),
    ("a.org", "*", "allow", "/tie"),
    ("a.org", "*", "disallow", "/tie"),
    ("a.org", "*", "disallow", "/w*z"),
    # host b: dugbot-specific group SHADOWS '*' entirely (RFC 2.2.2)
    ("b.org", "*", "disallow", "/"),
    ("b.org", "dugbot", "disallow", "/p4"),
]

URLS = [
    "https://a.org/p1/doc",      # disallow /p1
    "https://a.org/p1/ok/doc",   # allow /p1/ok (longer)
    "https://a.org/x9",          # $ anchor hits
    "https://a.org/x9/more",     # $ anchor misses -> allowed
    "https://a.org/tie",         # equal length -> allow wins
    "https://a.org/wxyz",        # wildcard hits
    "https://a.org/free",        # no match -> allowed
    "https://b.org/anything",    # '*' group shadowed -> allowed
    "https://b.org/p4/doc",      # dugbot rule -> disallowed
    "https://c.org/no/robots",   # host without rules -> allowed
]

WANT = {
    "https://a.org/p1/doc": False,
    "https://a.org/p1/ok/doc": True,
    "https://a.org/x9": False,
    "https://a.org/x9/more": True,
    "https://a.org/tie": True,
    "https://a.org/wxyz": False,
    "https://a.org/free": True,
    "https://b.org/anything": True,
    "https://b.org/p4/doc": False,
    "https://c.org/no/robots": True,
}


def test_robots_filter_rfc_semantics(spark):
    from dug_spark.operators.crawl import robots_filter

    urls = spark.createDataFrame([(u,) for u in URLS], "url string")
    rules = spark.createDataFrame(
        RULES, "host string, agent string, directive string, pattern string"
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, rules, "dugbot").collect()
    }
    assert got == WANT


def test_robots_filter_matches_mirror(spark):
    from dug_spark.functions import pyoracle as po
    from dug_spark.operators.crawl import robots_filter

    urls = spark.createDataFrame([(u,) for u in URLS], "url string")
    rules = spark.createDataFrame(
        RULES, "host string, agent string, directive string, pattern string"
    )
    got = sorted(
        (r["url"], r["allowed"])
        for r in robots_filter(urls, rules, "dugbot").collect()
    )
    assert got == po.robots_allowed(URLS, RULES, "dugbot")


def test_robots_mirror_is_rfc_truth(spark):
    from dug_spark.functions import pyoracle as po

    assert dict(po.robots_allowed(URLS, RULES, "dugbot")) == WANT
    # unknown agent on b.org falls back to the '*' group: everything off
    assert dict(po.robots_allowed(["https://b.org/x"], RULES, "otherbot")) == {
        "https://b.org/x": False
    }


# --- frontier_schedule -------------------------------------------------------


def test_frontier_round_robin_politeness(spark):
    from dug_spark.operators.crawl import frontier_schedule

    urls = [
        ("https://a.org/1", 5.0), ("https://a.org/2", 9.0),
        ("https://a.org/3", 1.0),
        ("https://b.org/1", 7.0),
        ("https://c.org/1", 2.0), ("https://c.org/2", 2.0),
    ]
    df = spark.createDataFrame(urls, "url string, prio double")
    rows = frontier_schedule(df, priority_col="prio").orderBy("crawl_order").collect()
    order = [r["url"] for r in rows]
    # round 1: each host's best URL, by priority desc: a/2 (9), b/1 (7), c/1
    # (prio tie 2.0 with c/2 -> url asc); round 2: a/1 (5), c/2; round 3: a/3
    assert order == [
        "https://a.org/2", "https://b.org/1", "https://c.org/1",
        "https://a.org/1", "https://c.org/2", "https://a.org/3",
    ]
    seqs = {r["url"]: r["host_seq"] for r in rows}
    assert seqs["https://a.org/3"] == 3 and seqs["https://b.org/1"] == 1
    # politeness invariant: within the global order, host_seq is
    # non-decreasing (no host's round k before every round k-1 done)
    assert [r["host_seq"] for r in rows] == sorted(r["host_seq"] for r in rows)


# --- parse_sitemaps ----------------------------------------------------------


SITEMAP_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url>
  <loc> https://a.org/p/1?x=1&amp;y=2 </loc>
  <lastmod>2024-03-01</lastmod>
  <changefreq>daily</changefreq>
  <priority>0.8</priority>
</url>
<url>
  <loc>https://a.org/p/2</loc>
</url>
<url>
  <loc>https://a.org/&lt;odd&gt;/&quot;q&quot;/&apos;s&apos;</loc>
  <priority>not-a-number</priority>
</url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>https://a.org/sm-1.xml</loc><lastmod>2024-01-02</lastmod></sitemap>
<sitemap><loc>https://a.org/sm-2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemaps_urlset_and_index(spark):
    df = spark.createDataFrame(
        [
            ("https://a.org/sitemap.xml", SITEMAP_URLSET),
            ("https://a.org/sitemap_index.xml", SITEMAP_INDEX),
            ("https://a.org/not-a-sitemap.xml", "<html><body>404</body></html>"),
            ("https://a.org/null.xml", None),
        ],
        "url string, xml string",
    )
    rows = (
        crawl.parse_sitemaps(df)
        .orderBy("sitemap_url", "entry_idx")
        .collect()
    )
    # non-sitemap and NULL pages emit zero rows
    assert len(rows) == 5
    idx = [r for r in rows if r["kind"] == "sitemapindex"]
    assert [r["loc"] for r in idx] == [
        "https://a.org/sm-1.xml", "https://a.org/sm-2.xml"
    ]
    assert [r["lastmod"] for r in idx] == ["2024-01-02", None]
    us = [r for r in rows if r["kind"] == "urlset"]
    assert [r["entry_idx"] for r in us] == [0, 1, 2]
    # loc is trimmed and entity-decoded (&amp; last)
    assert us[0]["loc"] == "https://a.org/p/1?x=1&y=2"
    assert (us[0]["lastmod"], us[0]["changefreq"], us[0]["priority"]) == (
        "2024-03-01", "daily", 0.8,
    )
    # absent optional fields are NULL
    assert (us[1]["lastmod"], us[1]["changefreq"], us[1]["priority"]) == (
        None, None, None,
    )
    # all five predefined entities decode; malformed priority -> NULL
    assert us[2]["loc"] == "https://a.org/<odd>/\"q\"/'s'"
    assert us[2]["priority"] is None


def test_parse_sitemaps_matches_mirror(spark):
    from dug_spark.functions import pyoracle as po

    pages = [
        ("https://a.org/sitemap.xml", SITEMAP_URLSET),
        ("https://a.org/sitemap_index.xml", SITEMAP_INDEX),
        ("https://a.org/not-a-sitemap.xml", "<html/>"),
    ]
    df = spark.createDataFrame(pages, "url string, xml string")
    got = sorted(
        tuple(r) for r in crawl.parse_sitemaps(df).collect()
    )
    want = sorted(po.sitemap_entry_rows(pages))
    assert got == want


def test_parse_sitemaps_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [("https://a.org/s.xml", SITEMAP_URLSET)], "url string, xml string"
    )
    plan = crawl.parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- parse_feeds -------------------------------------------------------------


FEED_RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Channel title stays out of entries</title>
<item>
  <title>Hello &amp; welcome</title>
  <link>https://a.org/post/1</link>
  <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
  <guid>tag:a.org,1</guid>
</item>
<item>
  <title>Bare item</title>
</item>
</channel></rss>"""

FEED_ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<entry>
  <title>Atom one</title>
  <link rel="alternate" href="https://b.org/e/1"/>
  <published>2024-01-02T00:00:00Z</published>
  <id>urn:b:1</id>
</entry>
<entry>
  <title>Updated only</title>
  <updated>2024-02-03T00:00:00Z</updated>
</entry>
</feed>"""


def test_parse_feeds_rss_and_atom(spark):
    df = spark.createDataFrame(
        [
            ("https://a.org/rss.xml", FEED_RSS),
            ("https://b.org/atom.xml", FEED_ATOM),
            ("https://c.org/page.html", "<html>not a feed</html>"),
        ],
        "url string, xml string",
    )
    rows = crawl.parse_feeds(df).orderBy("feed_url", "entry_idx").collect()
    assert len(rows) == 4
    rss = [r for r in rows if r["kind"] == "rss"]
    assert rss[0]["title"] == "Hello & welcome"  # entity-decoded
    assert rss[0]["link"] == "https://a.org/post/1"
    assert rss[0]["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert rss[0]["entry_id"] == "tag:a.org,1"
    # absent fields are NULL; channel-level title never leaks into items
    assert (rss[1]["link"], rss[1]["published"], rss[1]["entry_id"]) == (
        None, None, None,
    )
    atom = [r for r in rows if r["kind"] == "atom"]
    assert atom[0]["link"] == "https://b.org/e/1"  # href attribute form
    assert atom[0]["published"] == "2024-01-02T00:00:00Z"
    # published falls back to updated
    assert atom[1]["published"] == "2024-02-03T00:00:00Z"
    assert atom[1]["link"] is None and atom[1]["entry_id"] is None


def test_parse_feeds_matches_mirror(spark):
    from dug_spark.functions import pyoracle as po

    pages = [
        ("https://a.org/rss.xml", FEED_RSS),
        ("https://b.org/atom.xml", FEED_ATOM),
        ("https://c.org/x", "<html/>"),
        ("https://d.org/null", None),
    ]
    df = spark.createDataFrame(pages, "url string, xml string")
    got = sorted(tuple(r) for r in crawl.parse_feeds(df).collect())
    want = sorted(po.feed_entry_rows(pages))
    assert got == want


def test_parse_feeds_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [("https://a.org/rss.xml", FEED_RSS)], "url string, xml string"
    )
    plan = crawl.parse_feeds(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- allocate_budget ---------------------------------------------------------


def test_allocate_budget_largest_remainder(spark):
    from dug_spark.operators.crawl import allocate_budget

    hosts = spark.createDataFrame(
        [("a.org", 5.0), ("b.org", 3.0), ("c.org", 2.0)],
        "host string, score double",
    )
    # 10 slots at 5:3:2 -> exact 5,3,2 (no remainder)
    got = {r["host"]: r["quota"] for r in allocate_budget(hosts, 10).collect()}
    assert got == {"a.org": 5, "b.org": 3, "c.org": 2}
    # 11 slots -> exact 5.5,3.3,2.2; floors 5,3,2 leave 1 slot; largest
    # remainder 0.5 -> a.org
    got = {r["host"]: r["quota"] for r in allocate_budget(hosts, 11).collect()}
    assert got == {"a.org": 6, "b.org": 3, "c.org": 2}
    assert sum(got.values()) == 11


def test_allocate_budget_edge_cases(spark):
    from dug_spark.operators.crawl import allocate_budget

    # all-zero scores -> even split, remainder by host ASC
    zero = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0), ("c", 0.0)], "host string, score double"
    )
    got = {r["host"]: r["quota"] for r in allocate_budget(zero, 7).collect()}
    assert got == {"a": 3, "b": 2, "c": 2}  # 7/3 -> 2 each + 1 to 'a'
    # NULL / negative scores count as zero, never crash
    messy = spark.createDataFrame(
        [("a", None), ("b", -4.0), ("c", 6.0)], "host string, score double"
    )
    got = {r["host"]: r["quota"] for r in allocate_budget(messy, 9).collect()}
    assert got == {"a": 0, "b": 0, "c": 9}
    assert sum(got.values()) == 9


def test_allocate_budget_sums_and_bounds(spark):
    from pyspark.sql import functions as F2

    from dug_spark.operators.crawl import allocate_budget

    hosts = spark.range(997).select(
        F2.concat(F2.lit("h"), F2.col("id").cast("string")).alias("host"),
        ((F2.col("id") * 37) % 1001 + 1).cast("double").alias("score"),
    )
    out = allocate_budget(hosts, 123_457)
    rows = out.collect()
    assert sum(r["quota"] for r in rows) == 123_457
    # Hamilton guarantee: every quota within 1 of its exact share
    assert all(abs(r["quota"] - r["exact_share"]) <= 1.0 for r in rows)


# --- parse_robots / robots_sitemap_urls --------------------------------------


ROBOTS_RAW = """# acme crawler policy
Disallow: /headerless-junk
User-agent: DugBot
User-agent: OtherBot
Disallow: /private
Allow: /private/ok   # inline comment
Disallow:

User-agent: *
Disallow: /tmp
Sitemap: https://a.org/sitemap.xml
Sitemap: https://a.org/sitemap.xml
sitemap: https://a.org/sitemap-2.xml
"""


def test_parse_robots_groups(spark):
    df = spark.createDataFrame(
        [("a.org", ROBOTS_RAW), ("b.org", None)],
        "host string, robots_txt string",
    )
    rows = crawl.parse_robots(df).collect()
    got = {(r["host"], r["agent"], r["directive"], r["pattern"]) for r in rows}
    # both header agents receive both rules; agent lowercased; inline
    # comment stripped; headerless + empty-pattern rules dropped
    assert got == {
        ("a.org", "dugbot", "disallow", "/private"),
        ("a.org", "otherbot", "disallow", "/private"),
        ("a.org", "dugbot", "allow", "/private/ok"),
        ("a.org", "otherbot", "allow", "/private/ok"),
        ("a.org", "*", "disallow", "/tmp"),
    }
    maps = crawl.robots_sitemap_urls(df).collect()
    assert {(r["host"], r["sitemap_url"]) for r in maps} == {
        ("a.org", "https://a.org/sitemap.xml"),      # deduped
        ("a.org", "https://a.org/sitemap-2.xml"),    # key case-insensitive
    }


def test_parse_robots_matches_mirror(spark):
    from dug_spark.functions import pyoracle as po

    pages = [("a.org", ROBOTS_RAW), ("b.org", "User-agent: x\nAllow: /")]
    df = spark.createDataFrame(pages, "host string, robots_txt string")
    rules, maps = po.robots_parse_rows(pages)
    assert sorted(tuple(r) for r in crawl.parse_robots(df).collect()) == sorted(
        rules
    )
    assert sorted(
        tuple(r) for r in crawl.robots_sitemap_urls(df).collect()
    ) == sorted(maps)


def test_parse_robots_feeds_robots_filter(spark):
    """End-to-end: raw robots.txt -> parse_robots -> robots_filter
    reproduces the RFC verdicts of the pyoracle RFC mirror."""
    from dug_spark.functions import pyoracle as po

    pages = [
        (
            "a.org",
            "User-agent: dugbot\nDisallow: /private\nAllow: /private/pub\n",
        ),
        ("b.org", "User-agent: *\nDisallow: /\n"),
    ]
    urls = [
        "https://a.org/private/x",
        "https://a.org/private/pub/y",
        "https://a.org/open",
        "https://b.org/anything",
    ]
    raw = spark.createDataFrame(pages, "host string, robots_txt string")
    rules = crawl.parse_robots(raw).select("host", "agent", "directive", "pattern")
    udf_ = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["allowed"]
        for r in crawl.robots_filter(udf_, rules, "dugbot").collect()
    }
    want_rules = [tuple(r) for r in rules.collect()]
    assert got == dict(po.robots_allowed(urls, want_rules, "dugbot"))
    assert got["https://a.org/private/pub/y"] is True
    assert got["https://b.org/anything"] is False


def test_robots_crawl_delays(spark):
    from dug_spark.operators import crawl

    body = (
        "Crawl-delay: 99\n"          # headerless: drops
        "User-agent: DugBot\n"
        "Crawl-delay: 4\n"
        "Crawl-delay: fast\n"        # invalid: drops
        "Disallow: /x\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 1.5\n"
    )
    pages = spark.createDataFrame(
        [
            ("a.org", body),
            ("b.org", "User-agent: *\nCrawl-delay: 2.5\n"),
            ("c.org", "User-agent: DugBot\nCrawl-delay: 3\nCrawl-delay: 7\n"),
            ("d.org", "User-agent: other\nCrawl-delay: 9\n"),
            ("e.org", "User-agent: DugBot\nCrawl-delay: -2\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r.host: r.crawl_delay_s
        for r in crawl.robots_crawl_delays(pages, agent="DugBot").collect()
    }
    # specific beats '*'; conservative MAX within group; invalid,
    # negative, headerless and other-agent values all drop
    assert got == {"a.org": 4.0, "b.org": 2.5, "c.org": 7.0}


def test_frontier_schedule_with_delays(spark):
    from dug_spark.operators import crawl

    urls = spark.createDataFrame(
        [(f"https://h{i % 2}.org/p{i}",) for i in range(6)], "url string"
    )
    delays = spark.createDataFrame(
        [("h0.org", 10.0)], "host string, crawl_delay_s double"
    )
    got = {
        (r.host, r.host_seq): r.not_before_s
        for r in crawl.frontier_schedule(
            urls, delays=delays, default_delay_s=1.0
        ).collect()
    }
    assert got[("h0.org", 1)] == 0.0
    assert got[("h0.org", 3)] == 20.0   # robots delay
    assert got[("h1.org", 3)] == 2.0    # default delay
