"""Scraping-rule engine goldens: ApplyRule / ApplyRulesGroup semantics
transcribed from /root/reference/pkg/scraper (rules.go, extractor.go,
transforms.go) — ordered selector fallback, attribute extraction and
its error path, extract_all multiplicity, regex group-1 extraction,
critical abort, Go-marshal shaping, post-processing text transforms
with the validate abort, and group merge-append / stop-at-failure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thecrowler_spark.operators.scraping import (
    apply_rules_group,
    apply_scraping_rules,
    post_process_json,
    rule_matches_url,
)

ELEM = "array<struct<text:string,attrs:map<string,string>>>"
SCHEMA = f"doc_id string, url string, body string, selectors map<string,{ELEM}>"


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("d0", "https://shop.example.com/p/1", "sku: SKU-123 ref SKU-999",
         {"h1.title": [("Fancy  Widget", {})],
          "span.price": [("19.99 USD", {"data-price": "19.99", "currency": "USD"})],
          "a.next": [("next", {"href": "/p/2"}), ("more", {"href": "/p/3"})]}),
        ("d1", "https://shop.example.com/p/2", "no sku here",
         {"h1.title": [("Plain Widget", {})],
          "span.price": [("5.00 USD", {"currency": "USD"})],
          "a.next": [("next", {})]}),
        ("d2", "https://news.example.com/a/9", "body text SKU-777",
         {"h1.title": [("Headline", {})]}),
    ]
    return spark.createDataFrame(rows, SCHEMA)


RULES = [
    {
        "rule_name": "product",
        "url_patterns": [r"https?://shop\.example\.com/.*"],
        "elements": [
            {"key": "title", "selectors": [
                {"selector_type": "css", "selector": "h1.title"}]},
            {"key": "price", "selectors": [
                {"selector_type": "css", "selector": "span.price",
                 "extract_type": "attribute", "extract_pattern": "data-price"},
                {"selector_type": "css", "selector": "span.price"}]},
            {"key": "links", "selectors": [
                {"selector_type": "css", "selector": "a.next", "extract_all": True,
                 "extract_type": "attribute", "extract_pattern": "href"}]},
            {"key": "skus", "selectors": [
                {"selector_type": "regex", "selector": "SKU-([0-9]+)",
                 "extract_all": True}]},
        ],
        "post_processing": [
            {"type": "replace", "details": {"target": "Widget", "replacement": "Gadget"}},
            {"type": "clean", "details": {"remove_extra_whitespace": True}},
        ],
    },
    {
        "rule_name": "article",
        "url_patterns": [r"https?://news\.example\.com/.*"],
        "elements": [
            {"key": "headline", "selectors": [
                {"selector_type": "css", "selector": "h1.title"}]},
            {"key": "subtitle", "critical": True, "selectors": [
                {"selector_type": "css", "selector": "h2.sub"}]},
            {"key": "tail", "selectors": [
                {"selector_type": "regex", "selector": "SKU-[0-9]+"}]},
        ],
    },
]


@pytest.fixture(scope="module")
def result(spark, pages):
    out = apply_scraping_rules(pages, RULES)
    return {
        (r.doc_id, r.rule_name, r.elem_key): r
        for r in out.collect()
    }


def test_simple_text_extraction(result):
    assert result[("d0", "product", "title")].vals == ["Fancy  Widget"]


def test_attribute_extraction_wins_fallback(result):
    # data-price present -> first selector yields, text never consulted
    assert result[("d0", "product", "price")].vals == ["19.99"]


def test_attribute_missing_falls_through_to_text(result):
    # d1 span.price lacks data-price -> ExtractElement errors
    # (extractor.go:395-401) -> second selector extracts the text
    assert result[("d1", "product", "price")].vals == ["5.00 USD"]


def test_extract_all_attributes(result):
    assert result[("d0", "product", "links")].vals == ["/p/2", "/p/3"]


def test_attribute_error_discards_whole_selector(result):
    # d1 a.next matched but lacks href -> selector error -> nothing
    assert result[("d1", "product", "links")].vals == []


def test_regex_group_extraction_all(result):
    assert result[("d0", "product", "skus")].vals == ["123", "999"]


def test_regex_whole_match_first_only(result):
    # no capture group -> whole match; extract_all absent -> first
    assert result[("d2", "article", "tail")].status == "skipped"


def test_critical_abort_statuses(result):
    assert result[("d2", "article", "headline")].status == "ok"
    assert result[("d2", "article", "subtitle")].status == "failed_critical"
    assert result[("d2", "article", "tail")].status == "skipped"
    assert result[("d2", "article", "tail")].vals == []  # never evaluated
    assert result[("d2", "article", "headline")].rule_error is True


def test_rule_page_matching(result):
    # product never runs on news pages, article never on shop pages
    assert ("d2", "product", "title") not in result
    assert ("d0", "article", "headline") not in result


def test_marshal_shaping_and_postprocessing(result):
    # sorted keys, scalar/array/null shaping, replace + clean applied
    assert result[("d0", "product", "title")].scraped_json == (
        '{"links":["/p/2","/p/3"],"price":"19.99",'
        '"skus":["123","999"],"title":"Fancy Gadget"}'
    )
    # empty non-critical element marshals null (nil slice)
    assert result[("d1", "product", "links")].scraped_json == (
        '{"links":null,"price":"5.00 USD","skus":null,"title":"Plain Gadget"}'
    )
    # critical abort: later keys absent, post-processing skipped
    assert result[("d2", "article", "headline")].scraped_json == (
        '{"headline":"Headline"}'
    )


def test_group_merge_append_and_stop(spark, pages):
    group = {"group_name": "g", "rules": [
        {"rule_name": "base", "url_patterns": [r"https?://shop\.example\.com/.*"],
         "elements": [{"key": "title", "selectors": [
             {"selector_type": "css", "selector": "h1.title"}]}]},
        {"rule_name": "extras", "url_patterns": ["*"],
         "elements": [
             {"key": "title", "selectors": [
                 {"selector_type": "regex", "selector": "SKU-([0-9]+)",
                  "extract_all": True}]},
             {"key": "crit", "critical": True, "selectors": [
                 {"selector_type": "css", "selector": "nope"}]}]},
        {"rule_name": "after", "url_patterns": ["*"],
         "elements": [{"key": "never", "selectors": [
             {"selector_type": "css", "selector": "h1.title"}]}]},
    ]}
    got = {r.doc_id: r for r in apply_rules_group(pages, group).collect()}
    # merge appends (scalar + nested array), failing rule keeps its
    # partial map, 'after' never runs, every page errors (crit always
    # empty)
    assert got["d0"].scraped_json == '{"title":["Fancy  Widget",["123","999"]]}'
    assert got["d1"].scraped_json == '{"title":["Plain Widget",null]}'
    assert got["d2"].scraped_json == '{"title":"777"}'  # base didn't match
    assert all(got[d].group_error for d in got)


def test_group_rejects_rule_level_postprocessing(pages):
    group = {"group_name": "g", "rules": [
        {"rule_name": "r", "url_patterns": ["*"],
         "elements": [{"key": "k", "selectors": [
             {"selector_type": "css", "selector": "h1.title"}]}],
         "post_processing": [{"type": "remove", "details": {"target": "x"}}]},
    ]}
    with pytest.raises(ValueError, match="post-processing"):
        apply_rules_group(pages, group)


def test_post_process_validate_abort(spark):
    df = spark.createDataFrame([('{"a":"x 1  2"}',)], "j string")
    steps = [
        {"type": "remove", "details": {"target": " 1"}},
        {"type": "validate", "details": {"keys": ['"a"', "missing-key"]}},
        {"type": "replace", "details": {"target": "x", "replacement": "y"}},
    ]
    out, failed = post_process_json(F.col("j"), steps)
    row = df.select(out.alias("o"), failed.alias("f")).first()
    assert row.f is True  # validate failed -> caller keeps the raw input


def test_post_process_clean_order(spark):
    # clean options apply in the reference's fixed order
    # (transforms.go:72): entities decode BEFORE remove_special_chars
    df = spark.createDataFrame([("a &amp; b <i>9</i>  c",)], "j string")
    steps = [{"type": "clean", "details": {
        "decode_html_entities": True, "remove_html": True,
        "remove_numbers": True, "remove_special_chars": True,
        "remove_extra_whitespace": True}}]
    out, failed = post_process_json(F.col("j"), steps)
    row = df.select(out.alias("o"), failed.alias("f")).first()
    assert row.f is False
    assert row.o == "a b c"


def test_is_url_gate_rejects_non_url_patterns(spark):
    # CheckURL requires the pattern itself to look URL-ish
    # (ruleset/common.go:390-431): a bare word rule name never matches
    df = spark.createDataFrame([("https://shop.example.com/p/1",)], "url string")
    rule = {"rule_name": "product", "url_patterns": [r"shop[0-9]*"]}
    assert df.select(rule_matches_url(F.col("url"), rule).alias("m")).first().m is False
    rule2 = {"rule_name": "r", "url_patterns": [r"https?://shop\.example\.com/.*"]}
    assert df.select(rule_matches_url(F.col("url"), rule2).alias("m")).first().m is True
    rule3 = {"rule_name": "r", "url_patterns": ["*"]}
    assert df.select(rule_matches_url(F.col("url"), rule3).alias("m")).first().m is True
