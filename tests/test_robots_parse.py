"""robots.txt parser → rule rows (RFC 9309 grouping), wired into the
enforcement operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.robots import disallow_prefix_filter, parse_robots_txt

TXT = """
# comment
User-agent: googlebot
Disallow: /google-only

User-agent: *
Disallow: /private
Allow: /private/s0
Crawl-delay: 2.5
Disallow:

User-agent: evilbot
Disallow: /
"""


def test_parse_robots_groups(spark):
    docs = spark.createDataFrame([("h0.example.com", TXT)], "host string, robots_txt string")
    rules = parse_robots_txt(docs).collect()
    got = {(r["rule_type"], r["path_prefix"], r["crawl_delay"]) for r in rules}
    # only the '*' group applies: googlebot + evilbot groups are skipped;
    # empty Disallow dropped
    assert got == {
        ("disallow", "/private", 0.0),
        ("allow", "/private/s0", 0.0),
        ("crawl_delay", "", 2.5),
    }


def test_parse_feeds_enforcement(spark):
    docs = spark.createDataFrame([("h0.example.com", TXT)], "host string, robots_txt string")
    rules = parse_robots_txt(docs)
    links = spark.createDataFrame(
        [
            ("https://h0.example.com/public/a", "h0.example.com"),
            ("https://h0.example.com/private/x", "h0.example.com"),
            ("https://h1.example.com/private/x", "h1.example.com"),  # no robots → allowed
        ],
        "url_link string, host string",
    )
    kept = {r["url_link"] for r in disallow_prefix_filter(links, rules).collect()}
    assert kept == {
        "https://h0.example.com/public/a",
        "https://h1.example.com/private/x",
    }


def test_specific_agent_excludes_star(spark):
    docs = spark.createDataFrame([("h.example.com", TXT)], "host string, robots_txt string")
    rules = parse_robots_txt(docs, user_agent="googlebot").collect()
    got = {(r["rule_type"], r["path_prefix"]) for r in rules}
    # RFC 9309 §2.2.1: the most specific group wins — ONLY the googlebot
    # group applies; the '*' group (incl. its crawl-delay) is ignored
    assert got == {("disallow", "/google-only")}


def test_robots_verdict_allow_overrides(spark):
    """Allow'd sub-path of a Disallow'd prefix must be allowed (RFC 9309
    longest-match; the disallow-only fast path can't express this)."""
    from thecrowler_spark.operators.robots import robots_verdict

    docs = spark.createDataFrame([("h0.example.com", TXT)], "host string, robots_txt string")
    rules = parse_robots_txt(docs)
    links = spark.createDataFrame(
        [
            ("https://h0.example.com/private/s0/ok", "h0.example.com"),  # allow wins
            ("https://h0.example.com/private/s1", "h0.example.com"),     # disallowed
            ("https://h0.example.com/public/a", "h0.example.com"),       # no match
            ("https://h1.example.com/private/x", "h1.example.com"),      # no robots
        ],
        "url_link string, host string",
    )
    got = {r["url_link"]: r["robots_allowed"] for r in robots_verdict(links, rules).collect()}
    assert got == {
        "https://h0.example.com/private/s0/ok": True,
        "https://h0.example.com/private/s1": False,
        "https://h0.example.com/public/a": True,
        "https://h1.example.com/private/x": True,
    }


def test_robots_verdict_wildcards(spark):
    """RFC 9309 §2.2.3: '*' matches any char sequence, trailing '$'
    anchors the end; precedence is longest PATTERN (octets), allow on
    ties. Regex metachars inside patterns stay literal."""
    from thecrowler_spark.operators.robots import robots_verdict

    rules = spark.createDataFrame(
        [
            ("h0.example.com", "disallow", "/docs/"),
            ("h0.example.com", "disallow", "/*.pdf$"),
            ("h0.example.com", "allow", "/docs/*.html$"),
            ("h0.example.com", "disallow", "/private/*/tmp"),
            ("h0.example.com", "allow", "/a+b(c)"),  # metachars literal
            ("h0.example.com", "disallow", "/a"),
        ],
        "host string, rule_type string, path_prefix string",
    )
    cases = {
        "/docs/x.pdf": False,        # '/*.pdf$' (7) beats '/docs/' (6)
        "/docs/x.html": True,        # wildcard allow (13) beats '/docs/'
        "/docs/x.html.bak": False,   # $ anchor: .html$ does NOT match
        "/x.pdfz": True,             # $ anchor on pdf
        "/private/deep/x/tmp": False,  # '*' spans multiple segments
        "/private/tmp": True,        # needs something between the slashes
        "/a+b(c)": True,             # literal metachars matched; allow (7) > '/a' (2)
        "/a+bXc)": False,            # '(c)' is literal, not a group
        "/elsewhere": True,
    }
    links = spark.createDataFrame(
        [(f"https://h0.example.com{p}", "h0.example.com") for p in cases],
        "url_link string, host string",
    )
    got = {
        r["url_link"].replace("https://h0.example.com", ""): r["robots_allowed"]
        for r in robots_verdict(links, rules).collect()
    }
    assert got == cases


def test_crawl_delay_routes_into_budgets(spark):
    from thecrowler_spark.operators.robots import crawl_delay_budgets

    docs = spark.createDataFrame([("h0.example.com", TXT)], "host string, robots_txt string")
    rules = parse_robots_txt(docs)
    got = {
        r["host"]: r["max_fetches_per_round"]
        for r in crawl_delay_budgets(rules, round_duration_s=60.0).collect()
    }
    # Crawl-delay 2.5 → clamped to the 3 s minimum sleep → floor(60/3) = 20
    assert got == {"h0.example.com": 20}
