"""robots.txt kernel tests (RFC 9309 semantics) — the Spark route and
the independent DuckDB matcher are gated by the oracle queries
``robots_rules`` / ``robots_frontier``; these pin the kernel itself."""

from pdf_ocr_spark.kernels.robots import is_allowed, parse_robots, pattern_regex

TXT = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/public$
Disallow: /*.pdf$
Sitemap: https://x.test/sitemap.xml

User-agent: goodbot
Disallow:

User-agent: a
User-agent: b
Disallow: /shared

User-agent: badbot
Disallow: /
"""


class TestParse:
    def test_groups_and_counts(self):
        rules = parse_robots(TXT)
        agents = {r.agent for r in rules}
        assert agents == {"*", "goodbot", "a", "b", "badbot"}
        # multi-agent group: the same rule emitted for both tokens
        shared = [r for r in rules if r.pattern == "/shared"]
        assert {r.agent for r in shared} == {"a", "b"}

    def test_empty_disallow_sentinel(self):
        rules = [r for r in parse_robots(TXT) if r.agent == "goodbot"]
        assert len(rules) == 1
        assert rules[0].allow and rules[0].specificity == 0

    def test_sitemap_and_comments_ignored(self):
        assert all("sitemap" not in r.pattern.lower() for r in parse_robots(TXT))


class TestPatternRegex:
    def test_plain_prefix(self):
        assert pattern_regex("/private/") == "^/private/"

    def test_wildcard_and_anchor(self):
        assert pattern_regex("/*.pdf$") == r"^/.*\.pdf$"

    def test_metachars_escaped(self):
        assert pattern_regex("/a+b(c)") == r"^/a\+b\(c\)"


class TestMatch:
    def setup_method(self):
        self.rules = parse_robots(TXT)

    def test_longest_match_allow_wins(self):
        assert not is_allowed(self.rules, "*", "/private/x")
        assert is_allowed(self.rules, "*", "/private/public")

    def test_end_anchor(self):
        assert not is_allowed(self.rules, "*", "/docs/a.pdf")
        assert is_allowed(self.rules, "*", "/docs/a.pdf.html")

    def test_group_selection_no_fallback(self):
        # goodbot has its own (empty) group: '*' rules must NOT apply
        assert is_allowed(self.rules, "goodbot", "/private/x")
        # unknown agents use '*'
        assert not is_allowed(self.rules, "unknownbot", "/private/x")
        assert not is_allowed(self.rules, "badbot", "/anything")

    def test_no_rules_default_allow(self):
        assert is_allowed([], "*", "/whatever")


class TestReviewRegressions:
    """Regressions from review: query-string matching, case-insensitive
    scheme/host, mid-pattern '$' escaping."""

    def test_mid_pattern_dollar_escaped(self):
        assert pattern_regex("/a$b") == r"^/a\$b"
        rules = parse_robots("User-agent: *\nDisallow: /a$b\n")
        assert not is_allowed(rules, "*", "/a$b")
        assert is_allowed(rules, "*", "/ab")

    def test_query_targeting_rule(self):
        rules = parse_robots("User-agent: *\nDisallow: /*?print=\n")
        # kernel matcher receives path+query (as frontier_allowed extracts)
        assert not is_allowed(rules, "*", "/article?print=1")
        assert is_allowed(rules, "*", "/article?page=2")

    def test_crawl_delay_parsing(self):
        from pdf_ocr_spark.kernels.robots import parse_crawl_delays

        txt = (
            "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
            "User-agent: fast\nCrawl-delay: 0.5\n\n"
            "User-agent: bad\nCrawl-delay: soon\n"
        )
        assert parse_crawl_delays(txt) == [("*", 2.0), ("fast", 0.5)]

    def test_crawl_delay_closes_group(self):
        # a User-agent AFTER a crawl-delay starts a NEW group
        rules = parse_robots(
            "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"
        )
        assert {r.agent for r in rules} == {"b"}

    def test_sitemap_parsing(self):
        from pdf_ocr_spark.kernels.robots import parse_sitemaps

        txt = (
            "User-agent: *\nSitemap: https://x.test/s1.xml\nDisallow: /\n"
            "Sitemap: https://x.test/s1.xml\n"   # dup kept once
            "sitemap: https://x.test/s2.xml\n"   # case-insensitive field
        )
        assert parse_sitemaps(txt) == [
            "https://x.test/s1.xml", "https://x.test/s2.xml",
        ]


class TestSitemapXml:
    def test_urlset_with_lastmod_and_entities(self):
        from pdf_ocr_spark.kernels.robots import parse_sitemap_xml

        xml = (
            b'<urlset><url><loc>https://x.test/a?b=1&amp;c=2</loc>'
            b'<lastmod>2025-01-02</lastmod></url>'
            b'<url><loc> https://x.test/b </loc></url>'
            b'<url><loc>https://x.test/a?b=1&amp;c=2</loc></url></urlset>'
        )
        assert parse_sitemap_xml(xml) == [
            ("https://x.test/a?b=1&c=2", "2025-01-02", "url"),
            ("https://x.test/b", None, "url"),
        ]

    def test_sitemapindex_children(self):
        from pdf_ocr_spark.kernels.robots import parse_sitemap_xml

        idx = (
            b"<sitemapindex><sitemap><loc>https://x.test/s1.xml</loc>"
            b"</sitemap></sitemapindex>"
        )
        assert parse_sitemap_xml(idx) == [("https://x.test/s1.xml", None, "sitemap")]

    def test_gzip_and_poison(self):
        import gzip

        from pdf_ocr_spark.kernels.robots import parse_sitemap_xml

        xml = b"<urlset><url><loc>https://x.test/p</loc></url></urlset>"
        assert parse_sitemap_xml(gzip.compress(xml, mtime=0)) == [
            ("https://x.test/p", None, "url")
        ]
        assert parse_sitemap_xml(b"not xml") == []
        assert parse_sitemap_xml(b"\x1f\x8bcorrupt") == []


def test_fetch_schedule_slots_and_offsets(spark):
    from pdf_ocr_spark.operators.frontier import fetch_schedule

    frontier = spark.createDataFrame(
        [
            ("https://a.test/1", 5),
            ("https://a.test/2", 9),   # best priority -> slot 0
            ("https://a.test/3", 5),   # priority tie with /1 -> url order
            ("https://b.test/x", 1),
            ("HTTPS://B.test/UP", 9),  # scheme/host case-insensitive
        ],
        "url string, priority long",
    )
    delays = spark.createDataFrame([("a.test", 2.0)], "domain string, crawl_delay double")
    out = {
        r.url: (r.domain, r.slot, r.fetch_offset)
        for r in fetch_schedule(frontier, delays, default_delay=1.0).collect()
    }
    assert out["https://a.test/2"] == ("a.test", 0, 0.0)
    assert out["https://a.test/1"] == ("a.test", 1, 2.0)
    assert out["https://a.test/3"] == ("a.test", 2, 4.0)
    assert out["https://b.test/x"] == ("b.test", 1, 1.0)  # default delay
    assert out["HTTPS://B.test/UP"] == ("b.test", 0, 0.0)  # case-folded host


def test_parse_feed_rss_atom():
    from pdf_ocr_spark.kernels.robots import parse_feed

    rss = (
        b'<?xml version="1.0"?><rss version="2.0"><channel>'
        b"<item><title>Post &amp; One</title><link>https://a.test/p1</link>"
        b"<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
        b"<item><title><![CDATA[Two]]></title><link>https://a.test/p2</link></item>"
        b"</channel></rss>"
    )
    assert parse_feed(rss) == [
        ("https://a.test/p1", "Post & One", "Mon, 01 Jan 2024 00:00:00 GMT"),
        ("https://a.test/p2", "Two", None),
    ]
    atom = (
        b'<feed xmlns="http://www.w3.org/2005/Atom">'
        b'<entry><title>E1</title><link rel="self" href="https://b.test/self"/>'
        b'<link rel="alternate" href="https://b.test/e1"/>'
        b"<updated>2024-02-03T04:05:06Z</updated></entry>"
        b'<entry><link href="https://b.test/e2"/></entry></feed>'
    )
    assert parse_feed(atom) == [
        ("https://b.test/e1", "E1", "2024-02-03T04:05:06Z"),
        ("https://b.test/e2", None, None),
    ]
    # gzip transparent; garbage yields nothing
    import gzip

    assert parse_feed(gzip.compress(rss))[0][0] == "https://a.test/p1"
    assert parse_feed(b"not xml") == []
    assert parse_feed(b"\x1f\x8bbroken") == []


def test_resolve_redirects_chains_loops_direct(spark):
    from pdf_ocr_spark.operators.frontier import resolve_redirects

    red = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x"), ("q", "q2")],
        "url string, target string",
    )
    urls = spark.createDataFrame(
        [("a",), ("b",), ("n",), ("x",), ("q",)], "url string"
    )
    rows = {r.url: r for r in resolve_redirects(red, urls, max_hops=3).collect()}
    assert (rows["a"].final_url, rows["a"].n_hops, rows["a"].resolution) == \
        ("c", 2, "moved")
    assert (rows["n"].final_url, rows["n"].n_hops, rows["n"].resolution) == \
        ("n", 0, "direct")
    # 2-cycle never stops redirecting within the hop budget
    assert rows["x"].resolution == "unresolved" and rows["x"].n_hops == 3
    assert rows["q"].resolution == "moved" and rows["q"].final_url == "q2"


def test_crawl_budget_integer_exact_allocation(spark):
    from pdf_ocr_spark.operators.frontier import crawl_budget

    hosts = spark.createDataFrame(
        [("a.test", 3.0), ("b.test", 1.0), ("c.test", 0.0), ("d.test", 1.5)],
        "domain string, score double",
    )
    out = {r.domain: r.budget for r in crawl_budget(hosts, 110).collect()}
    # shares of 5.5: 3.0->60, 1.0->20, 0->0, 1.5->30 (floor quantized)
    assert out == {"a.test": 60, "b.test": 20, "c.test": 0, "d.test": 30}
    # floor under-allocates, never over-allocates
    assert sum(out.values()) <= 110

    # partition-order independence (BIGINT sum of quantized scores)
    again = {
        r.domain: r.budget
        for r in crawl_budget(hosts.repartition(3, "domain"), 110).collect()
    }
    assert again == out


def test_crawl_budget_all_zero_scores_no_divide_by_zero(spark):
    """Σ quantized score == 0 (all hosts zero-score, or every score below
    the 1e-6 quantum): every host gets budget 0 and stays in the output —
    ANSI mode must not raise DIVIDE_BY_ZERO (r3 ADVICE item)."""
    from pdf_ocr_spark.operators.frontier import crawl_budget

    hosts = spark.createDataFrame(
        [("a.test", 0.0), ("b.test", 0.0)], "domain string, score double"
    )
    out = {r.domain: r.budget for r in crawl_budget(hosts, 50).collect()}
    assert out == {"a.test": 0, "b.test": 0}

    tiny = spark.createDataFrame(
        [("a.test", 4e-7), ("b.test", 9e-7)], "domain string, score double"
    )
    out2 = {r.domain: r.budget for r in crawl_budget(tiny, 50).collect()}
    assert out2 == {"a.test": 0, "b.test": 0}


def test_change_rate_estimator_and_buckets(spark):
    """Cho & Garcia-Molina estimator on pinned capture histories:
    always-changing page → hot with the X=n finite estimate; never-
    changing → cold at rate 0; half-changing → warm; single capture →
    n=0 'unknown' with NULL rate."""
    import math
    from pdf_ocr_spark.operators.frontier import change_rate

    rows = []
    for s in range(6):
        rows.append(("hot", s, f"v{s}"))          # changes every interval
        rows.append(("cold", s, "same"))           # never changes
        rows.append(("warm", s, f"v{s // 2}"))     # changes every 2nd
    rows.append(("single", 0, "x"))
    caps = spark.createDataFrame(
        rows, "url string, snapshot_id int, fingerprint string"
    )
    got = {r["url"]: r for r in change_rate(caps).collect()}
    assert got["hot"]["recrawl"] == "hot"
    assert abs(got["hot"]["change_rate"] - round(-math.log(0.5 / 5.5), 6)) < 1e-9
    assert got["cold"]["recrawl"] == "cold"
    assert got["cold"]["change_rate"] == round(-math.log(5.5 / 5.5), 6) == 0.0
    assert got["warm"]["recrawl"] == "warm"
    assert got["warm"]["n_changes"] == 2
    assert got["single"]["recrawl"] == "unknown"
    assert got["single"]["change_rate"] is None
    assert got["single"]["n_intervals"] == 0
