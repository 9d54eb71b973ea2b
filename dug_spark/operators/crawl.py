"""Crawl-snapshot temporal analytics over (url, warc_ts, text) captures.

The BASELINE input is a Common-Crawl-style table of web-page captures
keyed by ``(url, warc_ts)`` — the same URL appears once per crawl.  A
100 TB corpus of repeated crawls needs temporal operators the reference
(a one-shot dbGaP/TOPMed ingester) never had reason to implement:

- ``capture_history``: per-capture change detection — did this capture's
  extracted text differ from the previous capture of the same URL?
- ``snapshot_churn``:  per-URL churn profile — capture count, change
  count, distinct content versions, change ratio, observed lifespan, and
  the mean seconds between content changes (the quantity a recrawl
  scheduler budgets against).

Scale shape (the 100 TB plan):
- ONE shuffle, keyed by URL.  ``capture_history`` is a lag window over
  ``partitionBy(url)``; URLs are near-unique keys (captures per URL is
  crawl-frequency-bounded, typically < 10^3), so the key space is huge
  and skew-free — the opposite of the hot-concept keys that need
  plans/skew.py.
- ``snapshot_churn`` aggregates the SAME url key immediately after the
  window: Spark's EnsureRequirements reuses the window's hash
  partitioning, so the groupBy adds NO second exchange (plan-asserted in
  tests/test_crawl.py::test_churn_single_shuffle).
- change detection compares xxhash64(text) (8 bytes/row carried through
  the shuffle), never the text itself; the oracle mirror uses md5 via an
  explicit ``hash_col`` for cross-engine verifiability — same plan, the
  hash function is a parameter, not a design difference.

No reference counterpart (crawl temporality is out of scope for dbGaP
ingest); semantics follow the change-rate estimator of Cho &
Garcia-Molina, "Estimating Frequency of Change" (ACM TOIT 2003): with
captures at known times, the observed change ratio X/(n-1) and the mean
inter-change interval are the sufficient statistics their Poisson
estimator consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def capture_history(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    hash_expr=None,
) -> DataFrame:
    """One row per capture: ``(url, warc_ts, content_hash, changed)``.

    ``changed`` is true when the capture's content hash differs from the
    previous capture of the same URL (ordered by ``ts_col``); the first
    capture of a URL has ``changed = NULL`` (there is no prior version —
    three-valued on purpose, so downstream SUMs of casts count only real
    transitions).

    ``hash_expr`` defaults to ``xxhash64(text)`` (8-byte fingerprints
    through the shuffle); pass e.g. ``F.md5(F.col("text"))`` when the
    output must be recomputable by another engine.
    """
    h = hash_expr if hash_expr is not None else F.xxhash64(F.col(text_col))
    w = Window.partitionBy(url_col).orderBy(F.col(ts_col).asc())
    out = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        h.alias("content_hash"),
    )
    prev = F.lag("content_hash").over(w)
    return out.withColumn(
        "changed",
        F.when(prev.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.col("content_hash") != prev
        ),
    )


def snapshot_churn(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    hash_expr=None,
) -> DataFrame:
    """Per-URL churn profile over all captures.

    Output, one row per distinct URL:
      - ``n_captures``      total captures observed
      - ``n_changes``       capture-to-capture content transitions
      - ``n_versions``      distinct content hashes ever observed
      - ``change_ratio``    n_changes / (n_captures - 1), NULL when only
                            one capture exists (no transition observable)
      - ``first_epoch`` / ``last_epoch``  observation window (unix secs)
      - ``mean_change_secs``  observed lifespan / n_changes, NULL when no
                            change was ever observed — the recrawl-period
                            estimate a scheduler consumes (Cho & G-M 03)

    Plan: the lag window (one url-keyed exchange) feeds a groupBy on the
    same key — no second exchange (EnsureRequirements reuses the hash
    partitioning).  All aggregates are algebraic, so map-side partial
    aggregation applies if the upstream ever changes.
    """
    hist = capture_history(df, url_col, ts_col, text_col, hash_expr)
    span = F.max(F.col("warc_ts").cast("long")) - F.min(
        F.col("warc_ts").cast("long")
    )
    n_changes = F.coalesce(
        F.sum(F.col("changed").cast("int")), F.lit(0)
    ).cast("long")
    return hist.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_captures"),
        n_changes.alias("n_changes"),
        F.countDistinct("content_hash").alias("n_versions"),
        F.round(
            n_changes / F.nullif(F.count(F.lit(1)) - F.lit(1), F.lit(0)), 6
        ).alias("change_ratio"),
        F.min(F.col("warc_ts").cast("long")).alias("first_epoch"),
        F.max(F.col("warc_ts").cast("long")).alias("last_epoch"),
        F.round(span / F.nullif(n_changes, F.lit(0)), 6).alias(
            "mean_change_secs"
        ),
    )


def triple_validity(
    obs: DataFrame,
    ts_col: str = "warc_ts",
    keys: tuple[str, ...] = ("subj", "pred", "obj"),
) -> DataFrame:
    """SCD-2-style validity intervals for triples observed across crawl
    snapshots: one row per maximal run of consecutive snapshots in which
    the triple was extracted — the temporal-KG view of a recrawled corpus
    (a triple that disappears and later reappears gets TWO intervals).

    Input: one row per (triple, snapshot) observation, ``ts_col`` the
    capture timestamp.  Output: keys + ``valid_from``/``valid_to`` (first
    and last snapshot of the run, closed interval), ``n_snapshots`` (run
    length), ``is_current`` (run extends to the newest global snapshot).

    Scale shape: the global snapshot TIMELINE is crawl-count-sized
    (10^2-10^3 rows for years of crawls), so its row_number window runs
    on one partition by design and the index table broadcasts back onto
    the corpus-sized observation set.  The island computation is then ONE
    triple-keyed shuffle: dropDuplicates, the run-id window
    (row_number over partitionBy(keys)), and the interval aggregate all
    share the same (subj, pred, obj) hash partitioning, so
    EnsureRequirements inserts a single exchange — same discipline as
    snapshot_churn.  Gaps-and-islands via snapshot_index - row_number:
    constant per consecutive run, strictly drops at a gap.
    """
    kcols = list(keys)
    timeline = obs.select(ts_col).distinct()
    idx = timeline.withColumn(
        "_snap_idx", F.row_number().over(Window.orderBy(ts_col))
    )
    o = obs.join(F.broadcast(idx), on=ts_col).dropDuplicates(
        kcols + ["_snap_idx"]
    )
    run = F.col("_snap_idx") - F.row_number().over(
        Window.partitionBy(*kcols).orderBy("_snap_idx")
    )
    out = (
        o.withColumn("_run", run)
        .groupBy(*kcols, "_run")
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.max(ts_col).alias("valid_to"),
            F.count(F.lit(1)).alias("n_snapshots"),
        )
        .drop("_run")
    )
    mx = timeline.agg(F.max(ts_col).alias("_max_ts"))
    return (
        out.crossJoin(F.broadcast(mx))
        .withColumn("is_current", F.col("valid_to") == F.col("_max_ts"))
        .drop("_max_ts")
    )


def _rule_regex(pattern_col):
    """robots.txt path pattern → regex, per RFC 9309 §2.2.3: '*' matches
    any char sequence, a trailing '$' anchors the end, everything else is
    literal.  Escape-first (all regex specials except '*', which we
    translate, with '$' only meaningful at the end), identical in the
    pure-Python mirror (pyoracle.robots_allowed)."""
    anchored = pattern_col.endswith("$")
    body = F.when(
        anchored, pattern_col.substr(F.lit(1), F.length(pattern_col) - F.lit(1))
    ).otherwise(pattern_col)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """RFC 9309 robots.txt compliance verdicts: one row per input URL
    with ``allowed`` decided by the spec's longest-match rule.

    ``rules``: (host, agent, directive['allow'|'disallow'], pattern) —
    the parsed robots.txt corpus, one row per rule line.  Group
    selection per the RFC: if a host has ANY rule group for ``agent``,
    only that group applies; otherwise the '*' group.  Within the
    selected group, the rule with the LONGEST pattern that matches the
    URL path wins; on a length tie the least-restrictive (allow) rule
    wins; no matching rule ⇒ allowed (and a host with no robots rows ⇒
    allowed).  Patterns support '*' wildcards and the trailing '$'
    anchor, translated to one regex evaluated JVM-side
    (F.regexp_like — no Python in the per-URL hot path).

    Scale shape: robots tables are dimension-sized next to a 10^12-URL
    frontier (one site's rules amortize over millions of URLs), so the
    selected rule group is BROADCAST and the whole operator is map-only
    until one url-keyed aggregate picks each URL's winning rule —
    max(struct(len, is_allow)) keeps it a plain partial+final hash agg,
    no window sort.  No reference counterpart (the reference ingests
    curated dbGaP archives, not crawls); semantics per RFC 9309 §2.2.2
    (group selection) and §2.2.3 (longest-match precedence), mirrored
    by pyoracle.robots_allowed as the VALUES oracle.
    """
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(url_col, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).alias(
            "_host"
        ),
        F.coalesce(
            F.nullif(
                F.regexp_extract(url_col, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("_path"),
    )
    # RFC group selection: agent-specific group shadows '*' entirely
    has_specific = (
        rules.where(F.col("agent") == agent)
        .select("host")
        .distinct()
        .withColumn("_specific", F.lit(True))
    )
    grp = (
        rules.join(F.broadcast(has_specific), "host", "left")
        .where(
            F.when(F.col("_specific").isNotNull(), F.col("agent") == agent)
            .otherwise(F.col("agent") == "*")
        )
        .select(
            F.col("host").alias("_host"),
            (F.col("directive") == "allow").alias("_is_allow"),
            F.col("pattern").alias("_pat"),
            _rule_regex(F.col("pattern")).alias("_rx"),
        )
    )
    matched = (
        u.join(F.broadcast(grp), "_host", "left")
        .where(F.col("_rx").isNull() | F.regexp_like(F.col("_path"), F.col("_rx")))
        .groupBy("url")
        .agg(
            F.max(
                F.when(
                    F.col("_rx").isNotNull(),
                    F.struct(
                        F.length("_pat").alias("l"),
                        F.col("_is_allow").cast("int").alias("a"),
                    ),
                )
            ).alias("_win")
        )
    )
    return u.select("url").join(matched, "url", "left").select(
        "url",
        F.coalesce(F.col("_win.a") == 1, F.lit(True)).alias("allowed"),
    )


def frontier_schedule(
    urls: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    delays: DataFrame | None = None,
    default_delay_s: float = 1.0,
) -> DataFrame:
    """Politeness-aware crawl-frontier ordering: round-robin across
    hosts so no host is hit twice before every other host with pending
    URLs is hit once — the standard frontier discipline (Mercator-style
    host queues, Heydon & Najork 1999) expressed as TWO windows:

    1. ``host_seq`` = rank of the URL within its host (by priority desc,
       then url asc — deterministic), i.e. which politeness round it
       belongs to;
    2. global crawl order = sort by (host_seq, priority desc, url) —
       round 1 of every host precedes round 2 of any host.

    Output: (url, host, host_seq, crawl_order).  Scale: one host-keyed
    shuffle for the per-host window (hosts are near-unique keys at
    web scale) and one global sort for the order — the sort is the
    OUTPUT contract (a frontier is consumed in order), not an
    intermediate.  priority_col=None means uniform priority (pure
    round-robin by url order).
    """
    prio = (
        F.col(priority_col).cast("double")
        if priority_col is not None
        else F.lit(0.0)
    )
    host = F.regexp_extract(url_col, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    w = Window.partitionBy("host").orderBy(F.desc("_prio"), F.asc(url_col))
    ranked = (
        urls.select(F.col(url_col).alias("url"), host.alias("host"), prio.alias("_prio"))
        .withColumn("host_seq", F.row_number().over(w))
    )
    wg = Window.orderBy(
        F.asc("host_seq"), F.desc("_prio"), F.asc("url")
    )
    ordered = ranked.withColumn("crawl_order", F.row_number().over(wg))
    if delays is None:
        return ordered.select("url", "host", "host_seq", "crawl_order")
    # robots Crawl-delay as real seconds: fetch k of a host may not start
    # before (k-1)·delay — the per-host politeness clock the dispatcher
    # enforces.  delays is host-cardinality → broadcast hash join.
    d = F.broadcast(delays.select("host", "crawl_delay_s"))
    return (
        ordered.join(d, "host", "left")
        .withColumn(
            "not_before_s",
            (F.col("host_seq") - 1)
            * F.coalesce("crawl_delay_s", F.lit(float(default_delay_s))),
        )
        .select("url", "host", "host_seq", "crawl_order", "not_before_s")
    )


# ---------------------------------------------------------------------------
# Sitemap protocol parsing (sitemaps.org/protocol.html, the public 0.9
# spec) — the discovery-side companion to robots_filter: a crawl
# frontier at 10^12 URLs is SEEDED from sitemaps, so parsing them is a
# corpus-scale map, not a driver-side convenience.


def _xml_unescape(col):
    """The five predefined XML entities the sitemap spec REQUIRES escaped
    in <loc> (protocol §'Sitemap file location'): named entities first,
    &amp; LAST — the standard single-pass order (decoding &amp; first
    would turn a literal '&amp;lt;' into '<')."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _tag(block, tag: str):
    """Trimmed inner text of the first <tag>..</tag> in the block ('' when
    absent); (?s) so values may wrap across lines."""
    return F.regexp_extract(block, f"(?s)<{tag}>\\s*(.*?)\\s*</{tag}>", 1)


def parse_sitemaps(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """Parse sitemap XML pages — both kinds the spec defines: ``urlset``
    (leaf sitemaps: <url> entries with loc / lastmod / changefreq /
    priority) and ``sitemapindex`` (<sitemap> entries with loc /
    lastmod, pointing at child sitemaps a crawler must fetch next).

    Returns one row per entry:
    (sitemap_url, kind, entry_idx, loc, lastmod, changefreq, priority)
    — loc XML-entity-decoded per spec, absent optional fields NULL,
    priority cast to DOUBLE (NULL when absent or malformed).  Pages that
    are neither kind emit zero rows.

    Scale shape (the 100 TB plan): entirely map-side — regexp block
    extraction + posexplode + per-entry regexp projections, all
    whole-stage codegen, no UDF, no shuffle; a corpus of sitemap
    captures parses in the same pass that read it.  The regex parser is
    deliberately namespace-lenient (matches <urlset ...> with any
    attributes; tags are matched unqualified) — sitemaps in the wild are
    machine-generated and flat, and the mirror oracle
    (pyoracle.sitemap_entry_rows) applies the same leniency."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))
    is_index = xml.rlike("(?s)<sitemapindex[\\s>]")
    is_urlset = xml.rlike("(?s)<urlset[\\s>]")
    blocks = F.when(
        is_index,
        F.regexp_extract_all(xml, F.lit("(?s)<sitemap>(.*?)</sitemap>"), 1),
    ).when(
        is_urlset,
        F.regexp_extract_all(xml, F.lit("(?s)<url>(.*?)</url>"), 1),
    ).otherwise(F.array().cast("array<string>"))
    kind = F.when(is_index, F.lit("sitemapindex")).when(
        is_urlset, F.lit("urlset")
    )
    b = F.col("_block")
    return (
        df.select(
            F.col(url_col).alias("sitemap_url"),
            kind.alias("kind"),
            F.posexplode(blocks).alias("entry_idx", "_block"),
        )
        .select(
            "sitemap_url",
            "kind",
            "entry_idx",
            F.nullif(_xml_unescape(_tag(b, "loc")), F.lit("")).alias("loc"),
            F.nullif(_tag(b, "lastmod"), F.lit("")).alias("lastmod"),
            F.nullif(_tag(b, "changefreq"), F.lit("")).alias("changefreq"),
            F.nullif(_tag(b, "priority"), F.lit(""))
            .try_cast("double")
            .alias("priority"),
        )
    )


# ---------------------------------------------------------------------------
# Feed parsing (RSS 2.0 per the public RSS spec; Atom per RFC 4287) —
# the third discovery surface next to robots.txt and sitemaps: feeds
# carry the freshest URLs plus editorial titles/timestamps, so a
# recrawl scheduler mines them corpus-wide.


def parse_feeds(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """Parse RSS 2.0 and Atom feed documents to one row per entry:

    ``(feed_url, kind, entry_idx, title, link, published, entry_id)`` —
    ``kind`` ∈ {'rss', 'atom'}; RSS entries are ``<item>`` blocks
    (title / <link> inner text / pubDate / guid), Atom entries are
    ``<entry>`` blocks (title / first <link … href="…"> attribute /
    published falling back to updated / id).  Titles and links are
    decoded for the five predefined XML entities; absent fields are
    NULL; non-feed pages emit zero rows.

    Scale shape: identical to parse_sitemaps — regexp block extraction
    + posexplode + per-entry regexp projections, whole-stage codegen,
    zero shuffle, zero UDF.  Namespace-lenient by design (unqualified
    tag matching), mirrored exactly by pyoracle.feed_entry_rows."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))
    is_atom = xml.rlike("(?s)<feed[\\s>]")
    is_rss = xml.rlike("(?s)<rss[\\s>]")
    blocks = F.when(
        is_atom,
        F.regexp_extract_all(xml, F.lit("(?s)<entry[\\s>](.*?)</entry>"), 1),
    ).when(
        is_rss,
        F.regexp_extract_all(xml, F.lit("(?s)<item[\\s>](.*?)</item>"), 1),
    ).otherwise(F.array().cast("array<string>"))
    kind = F.when(is_atom, F.lit("atom")).when(is_rss, F.lit("rss"))
    b = F.col("_block")
    atom_link = F.regexp_extract(b, '(?s)<link[^>]*href="([^"]*)"', 1)
    rss_link = _tag(b, "link")
    link = F.when(F.col("kind") == "atom", atom_link).otherwise(rss_link)
    published = F.when(
        F.col("kind") == "atom",
        F.coalesce(
            F.nullif(_tag(b, "published"), F.lit("")),
            F.nullif(_tag(b, "updated"), F.lit("")),
        ),
    ).otherwise(F.nullif(_tag(b, "pubDate"), F.lit("")))
    entry_id = F.when(F.col("kind") == "atom", _tag(b, "id")).otherwise(
        _tag(b, "guid")
    )
    return (
        df.select(
            F.col(url_col).alias("feed_url"),
            kind.alias("kind"),
            F.posexplode(blocks).alias("entry_idx", "_block"),
        )
        .select(
            "feed_url",
            "kind",
            "entry_idx",
            F.nullif(_xml_unescape(_tag(b, "title")), F.lit("")).alias("title"),
            F.nullif(_xml_unescape(link), F.lit("")).alias("link"),
            published.alias("published"),
            F.nullif(entry_id, F.lit("")).alias("entry_id"),
        )
    )


# ---------------------------------------------------------------------------
# Crawl budget allocation.  frontier_schedule orders URLs WITHIN hosts;
# the prior question at 10^12 scale is how many fetches each host gets
# from a bounded crawl budget.  Proportional-to-quality with
# largest-remainder rounding (Hamilton's method) is the standard
# integer apportionment: quotas sum EXACTLY to the budget and no host
# deviates from its exact share by ≥1.


def allocate_budget(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """Apportion ``budget`` integer fetch slots across hosts in
    proportion to ``score_col`` (NULL/negative scores count as 0; if
    every score is 0, the budget splits evenly).

    Largest-remainder: each host gets floor(budget · share); the
    leftover slots go one each to the hosts with the largest fractional
    remainders (ties broken by host ASC — fully deterministic).
    Returns ``(host, score, exact_share, quota)`` with
    sum(quota) == budget.

    Scale shape: one scalar total (map-side partial sum), a narrow
    projection, and ONE window rank over the host table to pick
    remainder winners — the input is host-cardinality (dimension-scale
    next to the corpus; ~10^8 rows at full web scale, a single
    sort-shuffle of a skinny frame)."""
    from pyspark.sql import Window

    clean = hosts.select(
        F.col(host_col).alias("host"),
        F.greatest(
            F.coalesce(F.col(score_col).cast("double"), F.lit(0.0)),
            F.lit(0.0),
        ).alias("score"),
    )
    tot = clean.agg(
        F.sum("score").alias("t"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total, n = float(tot["t"] or 0.0), int(tot["n"])
    if n == 0:
        return clean.select(
            "host", "score", F.lit(0.0).alias("exact_share"),
            F.lit(0).cast("long").alias("quota"),
        )
    share = (
        (F.col("score") / F.lit(total))
        if total > 0
        else (F.lit(1.0) / F.lit(float(n)))
    )
    exact = (F.lit(float(budget)) * share).alias("exact_share")
    base = clean.select("host", "score", exact).withColumn(
        "_floor", F.floor("exact_share").cast("long")
    )
    floor_sum = base.agg(F.sum("_floor")).collect()[0][0] or 0
    leftover = int(budget - floor_sum)
    w = Window.orderBy(
        (F.col("exact_share") - F.col("_floor")).desc(), F.col("host").asc()
    )
    return (
        base.withColumn("_r", F.row_number().over(w))
        .select(
            "host",
            "score",
            F.round("exact_share", 6).alias("exact_share"),
            (F.col("_floor") + (F.col("_r") <= leftover).cast("long")).alias(
                "quota"
            ),
        )
    )


# ---------------------------------------------------------------------------
# robots.txt PARSING (RFC 9309 §2.1-2.2) — robots_filter consumes a
# parsed rule table; this is the step that produces it from raw
# robots.txt bodies fetched corpus-wide, plus the Sitemap-line
# extraction that seeds parse_sitemaps (how sitemaps are DISCOVERED).


def _robots_lines(df: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """(host, line_no, key, value) per directive line: comments ('#' to
    end of line) stripped, keys lowercased, value split on the FIRST
    ':' (sitemap URLs contain ':'); non-directive lines drop."""
    raw = F.posexplode(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    )
    lines = df.select(
        F.col(host_col).alias("host"), raw.alias("line_no", "_raw")
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("_clean"),
    )
    colon = F.instr("_clean", ":")
    return lines.where(colon > 0).select(
        "host",
        "line_no",
        F.lower(F.trim(F.substring(F.col("_clean"), F.lit(1), colon - 1))).alias(
            "key"
        ),
        F.trim(F.expr("substring(_clean, instr(_clean, ':') + 1)")).alias(
            "value"
        ),
    )


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse raw robots.txt bodies into the rule table robots_filter
    consumes: ``(host, agent, directive, pattern, line_no)``.

    RFC 9309 grouping: consecutive ``User-agent`` lines form one group
    header; the Allow/Disallow lines that follow belong to EVERY agent
    in that header, until the next header starts.  Rules before any
    header are invalid and drop; empty patterns drop (an empty Disallow
    means "no restriction" — representing it as a rule row would
    prefix-match everything); agents lowercase per the RFC's
    case-insensitive product token.  Non-directive lines and unknown
    keys are ignored (Sitemap lines have their own extractor below).

    Scale shape: everything here runs on the ROBOTS table, which is
    host-cardinality (dimension-sized next to a 10^12-URL frontier).
    Measured plan: 4 exchanges — the host-keyed window for block-id
    assignment (robots files are ≤500 KiB by spec, so a host's
    partition is tiny), then the (host, block) repartitioning of both
    sides of the rules↔agents join plus its AQE finalization.  At 10^8
    hosts these are skinny-frame shuffles that amortize over millions
    of frontier URLs per host."""
    from pyspark.sql import Window

    kv = _robots_lines(df, host_col, text_col).where(
        F.col("key").isin("user-agent", "allow", "disallow")
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("key") == "user-agent").cast("int")
    block_start = (
        (is_ua == 1)
        & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    blocked = kv.withColumn(
        "block",
        F.sum(block_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agents = blocked.where(F.col("key") == "user-agent").select(
        "host", "block", F.lower(F.col("value")).alias("agent")
    )
    rules = blocked.where(
        (F.col("key") != "user-agent") & (F.col("value") != "")
        & (F.col("block") > 0)
    ).select(
        "host",
        "block",
        F.col("key").alias("directive"),
        F.col("value").alias("pattern"),
        "line_no",
    )
    return rules.join(agents, ["host", "block"]).select(
        "host", "agent", "directive", "pattern", "line_no"
    )


def robots_sitemap_urls(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` lines from raw robots.txt bodies — the discovery
    edge that feeds parse_sitemaps.  Per RFC 9309 §2.3 the directive is
    group-independent, so no window and no join — a narrow map plus the
    one distinct aggregate: ``(host, sitemap_url)``, deduped."""
    return (
        _robots_lines(df, host_col, text_col)
        .where((F.col("key") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def robots_crawl_delays(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "dugbot",
) -> DataFrame:
    """``Crawl-delay:`` extraction from raw robots.txt bodies →
    ``(host, crawl_delay_s)`` for one crawler product token — the third
    robots surface (after Allow/Disallow rules and Sitemap discovery)
    and the input that turns ``frontier_schedule``'s politeness rounds
    into actual seconds.

    Crawl-delay is not in RFC 9309 but is honored by major engines; the
    de-facto semantics mirrored here: the directive binds to its
    User-agent group, a specific-agent group takes precedence over
    ``*``, non-numeric/negative values drop, and multiple surviving
    values for one host take the MAX (the conservative politeness
    choice).

    Group boundaries are assigned over ALL directive lines BEFORE
    filtering to the keys this extractor consumes: consecutiveness of
    User-agent lines is judged against every line of the file, so a UA
    header run is ended by ANY intervening directive (an Allow/Disallow
    between two User-agent lines separates their groups).  Filtering
    first — the pre-r6 bug the round-5 advisor flagged — merged such
    groups and bound a later group's Crawl-delay to the earlier group's
    agents (measured: 'User-agent: dugbot / Disallow:/x / User-agent:
    other / Crawl-delay: 100 / User-agent: * / Crawl-delay: 1' returned
    100.0 for dugbot instead of the '*' group's 1.0).

    Scale shape: identical to parse_robots — everything is
    host-cardinality (dimension-sized); one host-keyed window + one
    (host, block) join.
    """
    from pyspark.sql import Window

    kv_all = _robots_lines(df, host_col, text_col)
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("key") == "user-agent").cast("int")
    block_start = (
        (is_ua == 1) & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    blocked = kv_all.withColumn(
        "block",
        F.sum(block_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).where(F.col("key").isin("user-agent", "crawl-delay"))
    agents = blocked.where(F.col("key") == "user-agent").select(
        "host", "block", F.lower(F.col("value")).alias("agent")
    )
    delays = blocked.where(
        (F.col("key") == "crawl-delay") & (F.col("block") > 0)
    ).select(
        # try_cast: malformed values become NULL and drop (ANSI mode
        # would otherwise fail the whole job on one bad robots line)
        "host", "block", F.col("value").try_cast("double").alias("delay_s")
    ).where(
        F.col("delay_s").isNotNull() & (F.col("delay_s") >= 0)
    )
    bound = delays.join(agents, ["host", "block"]).where(
        F.col("agent").isin(agent.lower(), "*")
    )
    per_agent = bound.groupBy("host", "agent").agg(
        F.max("delay_s").alias("delay_s")
    )
    # specific product token beats '*'
    return per_agent.groupBy("host").agg(
        F.coalesce(
            F.max(F.when(F.col("agent") != "*", F.col("delay_s"))),
            F.max(F.when(F.col("agent") == "*", F.col("delay_s"))),
        ).alias("crawl_delay_s")
    )
