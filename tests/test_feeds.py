"""RSS/Atom feed-item discovery vs the reference provider's own goldens.

The XML bodies and every expected value below are transcribed from the
reference's public test fixtures and assertions
(/root/reference/pkg/infoseed/searchproviders/testdata/{rss_feed,
atom_feed,rss_empty}.xml and searchproviders_test.go:269-430) — data,
not code. The feed URL stands in for the Go test's httptest server.
"""

from __future__ import annotations

import pytest

from thecrowler_spark.operators.feeds import classify_feeds, parse_feed_items

RSS_URL = "https://feeds.example.com/pub.xml"
ATOM_URL = "https://feeds.example.com/atom.xml"

# testdata/rss_feed.xml (verbatim fixture)
RSS_BODY = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0" xmlns:content="http://purl.org/rss/1.0/modules/content/" xmlns:dc="http://purl.org/dc/elements/1.1/">
  <channel>
    <title>Example Public Feed</title>
    <item>
      <title>Alpha public research update</title>
      <link>/research/alpha</link>
      <description>Alpha snippet from an RSS fixture.</description>
      <content:encoded>Long Alpha content from an RSS fixture.</content:encoded>
      <guid>rss-alpha-guid</guid>
      <pubDate>Fri, 05 Jun 2026 00:00:00 GMT</pubDate>
      <category>threat-intel</category>
      <author>analyst@example.com</author>
      <dc:creator>Research Analyst</dc:creator>
    </item>
    <item>
      <title>Unrelated update</title>
      <link>https://example.com/other</link>
      <description>This entry should be filtered by the query.</description>
    </item>
  </channel>
</rss>"""

# testdata/atom_feed.xml (verbatim fixture)
ATOM_BODY = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Example Atom Feed</title>
  <entry>
    <title>Beta public research note</title>
    <link href="/research/beta" rel="alternate" />
    <summary>Beta snippet from an Atom fixture.</summary>
    <content>Long Beta content from an Atom fixture.</content>
    <published>2026-06-05T00:00:00Z</published>
    <updated>2026-06-05T01:00:00Z</updated>
    <id>tag:example.com,2026:beta</id>
    <category term="atom-threat" label="Atom Threat" />
    <author>
      <name>Atom Analyst</name>
      <email>atom@example.com</email>
    </author>
  </entry>
</feed>"""

EMPTY_BODY = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0">
  <channel>
    <title>Empty Feed</title>
  </channel>
</rss>"""


def _feeds(spark, rows):
    return spark.createDataFrame(rows, "feed_order int, feed_url string, body string")


def _run(spark, rows, query, **kw):
    out = parse_feed_items(_feeds(spark, rows), query=query, **kw)
    return sorted(out.collect(), key=lambda r: r["rank"])


def test_rss_fixture_query_filters_and_normalizes(spark):
    # searchproviders_test.go:281-303 (query "Research Analyst")
    rows = _run(spark, [(0, RSS_URL, RSS_BODY)], "Research Analyst",
                page_size=10, max_pages=1, max_requests=1)
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://feeds.example.com/research/alpha"
    assert r["title"] == "Alpha public research update"
    assert r["snippet"] == "Alpha snippet from an RSS fixture."
    assert r["rank"] == 1 and r["score"] == 1.0
    assert r["item_id"] == "rss-alpha-guid"
    assert r["published_timestamp"] == "2026-06-05T00:00:00Z"  # RFC1123 GMT in
    assert r["matched_fields"] == "authors"
    assert r["feed_url"] == RSS_URL


@pytest.mark.parametrize("query,want", [
    ("Alpha public", "title"),          # test.go:343 substring in title
    ("research/alpha", "link"),         # :344 tokens both in resolved link
    ("Long Alpha content", "content"),  # :345
    ("threat-intel", "categories"),     # :346
    ("Research Analyst", "authors"),    # :347
])
def test_rss_field_match_matrix(spark, query, want):
    rows = _run(spark, [(0, RSS_URL, RSS_BODY)], query)
    assert len(rows) == 1
    assert want in rows[0]["matched_fields"].split(",")


def test_atom_fixture(spark):
    # searchproviders_test.go:305-328 (query "atom-threat")
    rows = _run(spark, [(0, ATOM_URL, ATOM_BODY)], "atom-threat")
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://feeds.example.com/research/beta"
    assert r["title"] == "Beta public research note"
    assert r["snippet"] == "Beta snippet from an Atom fixture."
    assert r["item_id"] == "tag:example.com,2026:beta"
    assert r["published_timestamp"] == "2026-06-05T00:00:00Z"
    assert r["matched_fields"] == "categories"


def test_empty_query_matches_all_fields_and_ranks_in_feed_order(spark):
    rows = _run(spark, [(0, RSS_URL, RSS_BODY), (1, ATOM_URL, ATOM_BODY)], "")
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert all(r["matched_fields"] == "title,link,content,categories,authors"
               for r in rows)
    assert rows[0]["url"] == "https://feeds.example.com/research/alpha"
    assert rows[1]["url"] == "https://example.com/other"
    assert rows[2]["url"] == "https://feeds.example.com/research/beta"
    assert rows[1]["score"] == 0.5


def test_empty_and_malformed_feeds_yield_no_items(spark):
    # test.go:392-430: malformed aborts the Go batch; here the feed is
    # classified and excluded, items from well-formed feeds survive.
    rows = _run(spark, [
        (0, "https://feeds.example.com/first.xml", EMPTY_BODY),
        (1, "https://feeds.example.com/bad.xml", "<html><body>nope</body></html>"),
        (2, "https://feeds.example.com/second.xml", RSS_BODY),
    ], "alpha")
    assert len(rows) == 1
    assert rows[0]["url"] == "https://feeds.example.com/research/alpha"
    kinds = {r["feed_url"]: r["feed_kind"] for r in classify_feeds(
        _feeds(spark, [
            (0, "a", EMPTY_BODY), (1, "b", "<html>x</html>"), (2, "c", ""),
            (3, "d", ATOM_BODY),
        ])).collect()}
    assert [kinds[k] for k in "abcd"] == ["rss", "malformed", "blank", "atom"]


def test_max_requests_and_trim(spark):
    # max_requests keeps the first feeds only (rss_feed.go:63-65);
    # page_size*max_pages trims the ranked prefix (Search :83-88).
    rows = _run(spark, [(0, RSS_URL, RSS_BODY), (1, ATOM_URL, ATOM_BODY)],
                "", max_requests=1)
    assert [r["url"] for r in rows] == [
        "https://feeds.example.com/research/alpha", "https://example.com/other"]
    rows = _run(spark, [(0, RSS_URL, RSS_BODY), (1, ATOM_URL, ATOM_BODY)],
                "", page_size=2, max_pages=1)
    assert [(r["rank"], r["url"]) for r in rows] == [
        (1, "https://feeds.example.com/research/alpha"),
        (2, "https://example.com/other")]


def test_link_fallbacks_and_scheme_guard(spark):
    body = """<rss version="2.0"><channel>
      <item><title>g</title><guid>https://g.example.com/1</guid></item>
      <item><title>m</title><link>mailto:x@example.com</link></item>
      <item><title>n</title></item>
      <item><title>rel</title><link>docs/page.html</link></item>
    </channel></rss>"""
    rows = _run(spark, [(0, "https://h.example.com/dir/feed.xml", body)], "")
    # guid fallback kept; mailto and linkless dropped; non-root relative
    # resolves against the feed directory
    assert [(r["title"], r["url"]) for r in rows] == [
        ("g", "https://g.example.com/1"),
        ("rel", "https://h.example.com/dir/docs/page.html")]


def test_cdata_entities_and_timestamp_layouts(spark):
    body = """<rss version="2.0"><channel>
      <item><title>c</title><link>https://x.example.com/1</link>
        <description><![CDATA[cdata <b>snippet</b>]]></description>
        <pubDate>Mon, 02 Jan 2006 15:04:05 +0000</pubDate></item>
      <item><title>e &amp; f</title><link>https://x.example.com/2</link>
        <description></description>
        <content:encoded>enc &lt;tag&gt; body</content:encoded>
        <pubDate>not a date</pubDate></item>
      <item><title>t3</title><link>https://x.example.com/3</link>
        <pubDate>2023-05-01T10:11:12.500+02:00</pubDate></item>
    </channel></rss>"""
    rows = _run(spark, [(0, RSS_URL, body)], "")
    assert rows[0]["snippet"] == "cdata <b>snippet</b>"
    assert rows[0]["published_timestamp"] == "2006-01-02T15:04:05Z"
    assert rows[1]["title"] == "e & f"
    assert rows[1]["snippet"] == "enc <tag> body"   # content fallback
    assert rows[1]["published_timestamp"] == "not a date"  # raw passthrough
    assert rows[2]["published_timestamp"] == "2023-05-01T08:11:12Z"  # UTC shift


def test_atom_link_pick_and_updated_fallback(spark):
    body = """<feed xmlns="http://www.w3.org/2005/Atom">
      <entry><title>pick</title>
        <link rel="self" href="https://f.example.com/self.xml"/>
        <link rel="alternate" href="/e/1"/>
        <updated>2024-02-03T04:05:06Z</updated>
        <author><name>alpha</name><email>sync@example.com</email></author>
      </entry>
      <entry><title>fb</title><link rel="enclosure" href="https://f.example.com/file"/></entry>
    </feed>"""
    rows = _run(spark, [(0, "https://f.example.com/atom.xml", body)], "alpha sync")
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://f.example.com/e/1"       # alternate wins
    assert r["published_timestamp"] == "2024-02-03T04:05:06Z"  # updated fallback
    assert r["matched_fields"] == "authors"              # name+email token join
    rows = _run(spark, [(0, "https://f.example.com/atom.xml", body)], "")
    assert [r["url"] for r in rows] == [
        "https://f.example.com/e/1", "https://f.example.com/file"]  # href fallback
