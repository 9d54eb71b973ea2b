

def test_crawl_delay_group_not_merged_across_rule_lines(spark):
    """Round-5 advisor finding: a UA header run is ended by ANY directive
    line — a Disallow between 'dugbot' and 'other' separates their
    groups, so 'other''s Crawl-delay must NOT bind to dugbot and dugbot
    falls back to the '*' group."""
    from dug_spark.operators import crawl

    body = (
        "User-agent: dugbot\n"
        "Disallow: /private\n"
        "User-agent: other\n"
        "Crawl-delay: 100\n"
        "User-agent: *\n"
        "Crawl-delay: 1\n"
    )
    df = spark.createDataFrame([("h1", body)], "host string, robots_txt string")
    rows = crawl.robots_crawl_delays(df, agent="dugbot").collect()
    assert [(r["host"], r["crawl_delay_s"]) for r in rows] == [("h1", 1.0)]
    # the symmetric direction: dugbot's own delay still wins over '*'
    body2 = (
        "User-agent: dugbot\n"
        "Crawl-delay: 7\n"
        "User-agent: *\n"
        "Crawl-delay: 1\n"
    )
    df2 = spark.createDataFrame([("h2", body2)], "host string, robots_txt string")
    rows2 = crawl.robots_crawl_delays(df2, agent="dugbot").collect()
    assert [(r["host"], r["crawl_delay_s"]) for r in rows2] == [("h2", 7.0)]
