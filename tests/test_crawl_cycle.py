"""End-to-end crawl-cycle integration: the full discovery→compliance→
budget→schedule chain composed from the crawl-family operators —

    robots.txt bodies
      → robots_sitemap_urls → parse_sitemaps  (discovery)
      → parse_robots → robots_filter          (compliance)
      → allocate_budget                       (apportionment)
      → frontier_schedule                     (politeness ordering)

Every stage is the library operator, no test-local logic; the chain is
exactly what a production frontier build would run per crawl cycle.
"""

from pyspark.sql import functions as F

from dug_spark.operators import crawl


ROBOTS = [
    (
        "a.org",
        "User-agent: dugbot\nDisallow: /private\n"
        "Sitemap: https://a.org/sitemap.xml\n",
    ),
    (
        "b.org",
        "User-agent: *\nDisallow: /\nSitemap: https://b.org/sitemap.xml\n",
    ),
    ("c.org", "Sitemap: https://c.org/sitemap.xml\n"),  # no rules at all
]


def _sitemap(host, paths):
    urls = "".join(
        f"<url><loc>https://{host}{p}</loc></url>" for p in paths
    )
    return (
        f"https://{host}/sitemap.xml",
        f'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{urls}</urlset>",
    )


SITEMAPS = [
    _sitemap("a.org", ["/home", "/private/x", "/news/1", "/news/2"]),
    _sitemap("b.org", ["/anything", "/else"]),
    _sitemap("c.org", ["/p1", "/p2", "/p3"]),
]


def test_full_crawl_cycle(spark):
    robots_raw = spark.createDataFrame(
        ROBOTS, "host string, robots_txt string"
    )

    # --- discovery: robots Sitemap lines name exactly the sitemap pages
    discovered = crawl.robots_sitemap_urls(robots_raw)
    assert {r["sitemap_url"] for r in discovered.collect()} == {
        u for u, _ in SITEMAPS
    }

    sitemap_pages = spark.createDataFrame(SITEMAPS, "url string, xml string")
    candidates = crawl.parse_sitemaps(sitemap_pages).select(
        F.col("loc").alias("url")
    )
    assert candidates.count() == 9

    # --- compliance: parsed rules drive robots_filter
    rules = crawl.parse_robots(robots_raw).select(
        "host", "agent", "directive", "pattern"
    )
    verdicts = crawl.robots_filter(candidates, rules, "dugbot")
    allowed = verdicts.where(F.col("allowed")).select("url")
    got = {r["url"] for r in allowed.collect()}
    # a.org /private blocked for dugbot; all of b.org blocked by the
    # '*' group; rule-less c.org fully allowed
    assert got == {
        "https://a.org/home",
        "https://a.org/news/1",
        "https://a.org/news/2",
        "https://c.org/p1",
        "https://c.org/p2",
        "https://c.org/p3",
    }

    # --- budget: hosts scored by allowed-URL count, 4 fetch slots
    hosts = allowed.groupBy(
        F.regexp_extract("url", r"^https://([^/]+)", 1).alias("host")
    ).agg(F.count(F.lit(1)).cast("double").alias("score"))
    quotas = crawl.allocate_budget(hosts, 4)
    q = {r["host"]: r["quota"] for r in quotas.collect()}
    # 6 allowed urls, 3:3 across two hosts -> exact 2+2 of 4 slots
    assert q == {"a.org": 2, "c.org": 2}
    assert sum(q.values()) == 4

    # --- schedule: frontier ordering, then cut to each host's quota
    scheduled = crawl.frontier_schedule(
        allowed.withColumn("prio", F.length("url").cast("double"))
    )
    fetch_list = (
        scheduled.join(quotas.select("host", "quota"), "host")
        .where(F.col("host_seq") <= F.col("quota"))
        .orderBy("crawl_order")
        .collect()
    )
    assert len(fetch_list) == 4
    # politeness survives the quota cut: host_seq non-decreasing along
    # the global order, and no host exceeds its quota
    assert [r["host_seq"] for r in fetch_list] == sorted(
        r["host_seq"] for r in fetch_list
    )
    per_host = {}
    for r in fetch_list:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    assert per_host == q
