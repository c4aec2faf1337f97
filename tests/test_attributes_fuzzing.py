"""Unit tests: normalizer registry, EAV attribute indexing, URL fuzzing.

Golden cases transcribed from the reference semantics:
- normalizers map            /root/reference/pkg/crawler/attribute_indexing.go:74-107
- UnixToDateTime heuristic   /root/reference/pkg/crawler/attribute_indexing.go:110-132
- FuzzURL query/path fuzz    /root/reference/pkg/crawler/fuzzing_rules.go:28-108
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.functions import normalizers as N
from thecrowler_spark.operators.attributes import (
    AttributeSpec,
    correlate_by_value,
    extract_attributes,
)
from thecrowler_spark.operators.fuzzing import RULES_SCHEMA, fuzz_urls


def _one(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col.alias("out")).first()["out"]


def test_collapse_spaces(spark):
    assert _one(spark, N.collapse_spaces("v"), "  a \t b\n\nc ") == "a b c"


def test_remove_punctuation_keeps_letters_digits_space(spark):
    assert _one(spark, N.remove_punctuation("v"), "a-b_c! 1,2;3") == "abc 123"


def test_normalize_email(spark):
    assert _one(spark, N.normalize_email("v"), "  Bob@Example.COM ") == "bob@example.com"


def test_normalize_url_attr_lowercases_scheme_host_strips_fragment(spark):
    got = _one(spark, N.normalize_url_attr("v"), "HTTPS://Ex.COM/KeepCase?Q=1#frag")
    assert got == "https://ex.com/KeepCase?Q=1"


def test_unix_to_datetime_seconds_ms_and_fallback(spark):
    # seconds
    assert _one(spark, N.unix_to_datetime("v"), "1700000000") == "2023-11-14T22:13:20Z"
    # milliseconds (>9999999999 → ÷1000, attribute_indexing.go:125-127)
    assert _one(spark, N.unix_to_datetime("v"), "1700000000123") == "2023-11-14T22:13:20Z"
    # non-numeric → trimmed passthrough (Go trims before the fallback return)
    assert _one(spark, N.unix_to_datetime("v"), " not-a-ts ") == "not-a-ts"


def test_normalize_unicode_nfc(spark):
    # e + combining acute (NFD) → é (NFC)
    got = _one(spark, N.normalize_unicode(F.col("v")), "Café")
    assert got == "Café"


def test_fix_utf8_strips_controls_keeps_newline_tab(spark):
    assert _one(spark, N.fix_utf8("v"), "a\x00b\x07c\td\ne") == "abc\td\ne"


def test_apply_normalizers_chain_order(spark):
    col = N.apply_normalizers("v", ["trim", "lowercase", "collapse_spaces"])
    assert _one(spark, col, "  A   B  ") == "a b"


def test_extract_attributes_eav_and_hash(spark):
    objs = spark.createDataFrame(
        [(1, '{"a": {"k": " X "}}'), (2, '{"a": {"k": "x"}}'), (3, "{}")],
        "object_id long, details string",
    )
    attrs = extract_attributes(objs, [AttributeSpec("k", "$.a.k", ("trim", "lowercase"))])
    rows = {r["object_id"]: r for r in attrs.collect()}
    assert set(rows) == {1, 2}  # missing path → no row (crawler.go skips nulls)
    assert rows[1]["normalized_value"] == rows[2]["normalized_value"] == "x"
    assert rows[1]["value_hash"] == rows[2]["value_hash"]
    assert len(rows[1]["value_hash"]) == 64


def test_correlate_by_value_pairs(spark):
    objs = spark.createDataFrame(
        [(1, '{"k": "a"}'), (2, '{"k": "a"}'), (3, '{"k": "a"}'), (4, '{"k": "b"}')],
        "object_id long, details string",
    )
    attrs = extract_attributes(objs, [AttributeSpec("k", "$.k", ("trim",))])
    pairs = {(r["object_a"], r["object_b"]) for r in correlate_by_value(attrs).collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}  # a<b, no self-pairs


def test_fuzz_urls_query_and_path(spark):
    urls = spark.createDataFrame(
        [("https://h.example.com/v1/items?id=3&x=2",), ("https://h.example.com/plain",)],
        "url string",
    )
    rules = spark.createDataFrame(
        [("rq", "query", "id", ["7"]), ("rp", "path", "/v1", ["/v2"])], RULES_SCHEMA
    )
    got = {(r["rule_name"], r["url"], r["fuzzed_url"]) for r in fuzz_urls(urls, rules).collect()}
    assert got == {
        ("rq", "https://h.example.com/v1/items?id=3&x=2", "https://h.example.com/v1/items?id=7&x=2"),
        ("rp", "https://h.example.com/v1/items?id=3&x=2", "https://h.example.com/v2/items?id=3&x=2"),
        # 'plain' has no query → no query fuzz; no '/v1' → no path fuzz
    }


def test_fuzz_urls_appends_missing_param(spark):
    urls = spark.createDataFrame([("https://h.example.com/i?x=1",)], "url string")
    rules = spark.createDataFrame([("rq", "query", "id", ["5"])], RULES_SCHEMA)
    row = fuzz_urls(urls, rules).first()
    assert row["fuzzed_url"] == "https://h.example.com/i?x=1&id=5"


def test_fuzz_urls_metachar_selector_and_value(spark):
    """Regex metacharacters in selectors/values are treated literally
    (the reference never uses regex — strings.Replace / url.Values)."""
    urls = spark.createDataFrame(
        [("https://h.example.com/api?ids[]=1&x=2",), ("https://v1-cdn.example.com/v1/items",)],
        "url string",
    )
    rules = spark.createDataFrame(
        [("rq", "query", "ids[]", ["$ref"]), ("rp", "path", "/v1", ["/v2"])], RULES_SCHEMA
    )
    got = {(r["rule_name"], r["fuzzed_url"]) for r in fuzz_urls(urls, rules).collect()}
    assert ("rq", "https://h.example.com/api?ids[]=$ref&x=2") in got
    # path selector '/v1' must hit the PATH, never the hostname
    assert ("rp", "https://v1-cdn.example.com/v2/items") in got
    assert not any("v2-cdn" in u for _, u in got)
