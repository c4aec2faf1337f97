"""Dorking tokenizer goldens: separators, specifier validation, control
modifiers (tokenizer.go:82-86,199-207,329-330,561-574)."""

from __future__ import annotations

from thecrowler_spark.operators.search import (
    extract_control_modifier,
    is_valid_specifier,
    parse_query,
    tokenize,
)


def test_tokenize_operators_and_phrases():
    assert tokenize('a "b c" | d & e') == ["a", '"b c"', "|", "d", "&", "e"]
    assert tokenize("a && b") == ["a", "&&", "b"]
    # '&' inside a token (URL query string) is NOT an operator
    assert tokenize("url:x?a=1&b=2") == ["url:x?a=1&b=2"]
    # attached control modifier stays in the token for later extraction
    assert tokenize("term&limit:10") == ["term&limit:10"]


def test_is_valid_specifier():
    for ok in ("title", "summary", "content", "details", "&details",
               "limit", "&limit", "offset", "&offset", "file_type", "@a.b"):
        assert is_valid_specifier(ok), ok
    for bad in ("foo", "lang2", ""):
        assert not is_valid_specifier(bad), bad


def test_extract_control_modifier_goldens():
    # both separators; remainder-of-token semantics; parse failure intact
    assert extract_control_modifier("term&limit:10", "limit", None) == ("term", 10)
    assert extract_control_modifier("term&limit=25", "limit", None) == ("term", 25)
    assert extract_control_modifier("&offset:5", "offset", 0) == ("", 5)
    assert extract_control_modifier("term&limit:x", "limit", 7) == ("term&limit:x", 7)
    assert extract_control_modifier("plain", "limit", 7) == ("plain", 7)


def test_parse_query_modifiers_and_cleanup():
    tokens, limit, offset = parse_query('a "q p" b&limit:30 &offset=2', limit=10)
    assert tokens == ["a", '"q p"', "b"]
    assert (limit, offset) == (30, 2)
    # untouched query keeps defaults
    tokens, limit, offset = parse_query("x | y", limit=10)
    assert tokens == ["x", "|", "y"] and (limit, offset) == (10, 0)


def test_field_equal_separator(spark):
    """field=term ≡ field:term; invalid specifier stays a literal term."""
    from pyspark.sql import functions as F

    from thecrowler_spark.operators.search import compile_search

    pages = spark.createDataFrame(
        [(1, "Alpha Spark", "", "the data engine", "en"),
         (2, "Beta", "", "nothing here", "en"),
         (3, "foo:bar literal", "", "foo:bar appears verbatim", "en")],
        "doc_id long, title string, summary string, body_text string, detected_lang string",
    )
    eq_hits = {r["doc_id"] for r in pages.filter(compile_search("title=alpha")).collect()}
    colon_hits = {r["doc_id"] for r in pages.filter(compile_search("title:alpha")).collect()}
    assert eq_hits == colon_hits == {1}
    # 'foo' is not a valid specifier → the whole token is a substring term
    lit_hits = {r["doc_id"] for r in pages.filter(compile_search("foo:bar")).collect()}
    assert lit_hits == {3}
    # content= maps to body_text
    c_hits = {r["doc_id"] for r in pages.filter(compile_search("content=data")).collect()}
    assert c_hits == {1}
