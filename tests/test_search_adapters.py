"""Search-provider JSON adapters vs the reference's own fixtures.

Bodies and expected values transcribed from /root/reference/pkg/
infoseed/searchproviders/testdata/{generic,brave,bing}_*.json and
searchproviders_test.go — data, not code.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thecrowler_spark.operators.search_adapters import (
    classify_search,
    parse_search_results,
)

GENERIC = ('{"results": [{"url": "https://example.net/", "title": "Generic Example",'
           ' "snippet": "Generic snippet.", "score": 0.75}], "total": 1}')
BRAVE = """{
  "query": {"original": "seed query", "show_strict_warning": false},
  "web": {"type": "search", "total": 2, "results": [
    {"title": "Example Domain", "url": "https://example.com/",
     "description": "Example snippet from Brave.",
     "page_age": "2026-05-01T00:00:00"},
    {"title": "Example Org", "url": "https://example.org/",
     "description": "Second Brave snippet.", "language": "en"}
  ]}
}"""
BING = """{
  "_type": "SearchResponse",
  "webPages": {"totalEstimatedMatches": 123, "value": [
    {"name": "Example Domain", "url": "https://example.com/",
     "displayUrl": "example.com", "snippet": "Example snippet from Bing."},
    {"name": "Example Org", "url": "https://example.org/",
     "displayUrl": "example.org", "snippet": "Second Bing snippet."}
  ]}
}"""
BRAVE_MALFORMED = '{"query":{"original":"bad"},"web":{"results": {"unexpected": true}}}'


def _pages(spark, rows):
    return spark.createDataFrame(rows, "page_order int, body string")


def _run(spark, rows, provider, **kw):
    out = parse_search_results(_pages(spark, rows), provider=provider, **kw)
    return sorted(out.collect(), key=lambda r: (r["page_order"], r["rank"]))


def test_generic_fixture_and_score_passthrough(spark):
    rows = _run(spark, [(0, GENERIC)], "generic")
    assert len(rows) == 1
    r = rows[0]
    assert (r["url"], r["title"], r["snippet"], r["rank"], r["score"]) == (
        "https://example.net/", "Generic Example", "Generic snippet.", 1, 0.75)


def test_brave_fixture(spark):
    rows = _run(spark, [(0, BRAVE)], "brave_search")
    assert [(r["rank"], r["url"], r["title"], r["snippet"], r["score"])
            for r in rows] == [
        (1, "https://example.com/", "Example Domain",
         "Example snippet from Brave.", 1.0),
        (2, "https://example.org/", "Example Org", "Second Brave snippet.", 0.5),
    ]


def test_bing_fixture_name_key(spark):
    rows = _run(spark, [(0, BING)], "bing_web_search")
    assert [(r["rank"], r["url"], r["title"], r["snippet"]) for r in rows] == [
        (1, "https://example.com/", "Example Domain", "Example snippet from Bing."),
        (2, "https://example.org/", "Example Org", "Second Bing snippet."),
    ]


def test_malformed_and_blank_classification(spark):
    # brave_malformed.json: web.results not an array → whole page
    # malformed (parseBraveResults :714-718); generic tolerates any
    # item shapes; not-JSON malformed everywhere; '' blank.
    kinds = {r["page_order"]: r["search_kind"] for r in classify_search(
        _pages(spark, [(0, BRAVE_MALFORMED), (1, BRAVE), (2, ""), (3, "not json"),
                       (4, '{"web":{"results":[{"url":"x"},3]}}')]),
        provider="brave_search").collect()}
    assert kinds == {0: "malformed", 1: "ok", 2: "blank", 3: "malformed",
                     4: "malformed"}  # non-object item aborts (:724-727)
    gk = {r["page_order"]: r["search_kind"] for r in classify_search(
        _pages(spark, [(0, BRAVE_MALFORMED), (1, "not json")]),
        provider="generic").collect()}
    assert gk == {0: "ok", 1: "malformed"}
    rows = _run(spark, [(0, BRAVE_MALFORMED), (1, BRAVE)], "brave_search")
    assert {r["page_order"] for r in rows} == {1}


def test_generic_item_shapes_and_rank_consumption(spark):
    # findResultItems/resultFromValue corners: plain-string items,
    # link/href fallbacks, numeric item skipped but its rank CONSUMED,
    # blank-string score stays 0, organic_results path, array root,
    # singleton-map fallback.
    body = ('{"organic_results": ["https://s.example/1",'
            ' {"link": "https://s.example/2", "summary": "S2"},'
            ' 3,'
            ' {"name": "no url"},'
            ' {"href": "https://s.example/4", "description": "S4", "score": 2}]}')
    rows = _run(spark, [(0, body)], "generic")
    assert [(r["rank"], r["url"], r["snippet"], r["score"]) for r in rows] == [
        (1, "https://s.example/1", "", 0.0),
        (2, "https://s.example/2", "S2", 0.0),
        (5, "https://s.example/4", "S4", 2.0),
    ]
    rows = _run(spark, [(0, '["https://r.example/a", "https://r.example/b"]')],
                "generic")
    assert [(r["rank"], r["url"]) for r in rows] == [
        (1, "https://r.example/a"), (2, "https://r.example/b")]
    rows = _run(spark, [(0, '{"single": true, "displayUrl": "https://d.example/"}')],
                "generic")
    assert [(r["rank"], r["url"]) for r in rows] == [(1, "https://d.example/")]


def test_budget_trim_and_max_requests_without_rerank(spark):
    # Search() appends per-page results verbatim: ranks restart per
    # page, the trim is the fetch-order prefix (:159-178).
    page = '{"results":[{"url":"https://p.example/%d/1"},{"url":"https://p.example/%d/2"}]}'
    rows = _run(spark, [(0, page % (0, 0)), (1, page % (1, 1)), (2, page % (2, 2))],
                "generic", page_size=2, max_pages=2)
    assert [(r["page_order"], r["rank"], r["url"]) for r in rows] == [
        (0, 1, "https://p.example/0/1"), (0, 2, "https://p.example/0/2"),
        (1, 1, "https://p.example/1/1"), (1, 2, "https://p.example/1/2")]
    rows = _run(spark, [(0, page % (0, 0)), (1, page % (1, 1))],
                "generic", page_size=10, max_pages=4, max_requests=1)
    assert {r["page_order"] for r in rows} == {0}
