"""Goldens for content-type detection + HTML sniffing (P10/P11).

Cases transcribed from /root/reference/pkg/crawler/content_type.go:146-206
and web.go:3044-3089.
"""

from __future__ import annotations

from thecrowler_spark.operators.content_type import (
    detect_content_type,
    looks_like_html,
    sniff_html,
)

CASES = [
    # (body, url, expected_type)
    ("<!DOCTYPE html><html></html>", "", "text/html"),
    ("  \n <html lang='en'>", "", "text/html"),
    ("", "https://x.example.com/a.HTML?q=1", "text/html"),
    ('<?xml version="1.0"?><a/>', "", "text/xml"),
    ('{"k": "v"}', "", "application/json"),
    ("[1, 2, 3]", "", "application/json"),
    ("@import url(x);", "", "text/css"),
    (".cls { color: red }", "", "text/css"),
    ("", "https://x.example.com/f.pdf", "application/pdf"),
    ("%PDF-1.7 stream", "", "application/pdf"),
    ("", "", "text/empty"),
    ("  ", "  ", "text/empty"),
    ("just prose", "https://x.example.com/f.bin", "unknown"),
]


def test_detect_content_type_goldens(spark):
    df = spark.createDataFrame(
        [(i, b, u) for i, (b, u, _) in enumerate(CASES)], "id int, body string, url string"
    )
    got = {
        r["id"]: r["ct"]
        for r in df.select("id", detect_content_type("body", "url").alias("ct")).collect()
    }
    for i, (b, u, want) in enumerate(CASES):
        assert got[i] == want, f"case {i} ({b[:20]!r}, {u!r}): {got[i]} != {want}"


def test_sniff_and_looks_like_html(spark):
    rows = [
        ("<!DOCTYPE html><p>x</p>", True, True),
        ("\n\t  <HTML>", True, True),
        ("<head><title>t</title>", True, True),
        ('x<meta charset="utf-8">', True, False),  # sniff-only marker
        ("plain text", False, False),
        ("a" * 600 + "<html>", False, True),  # beyond 512-byte sniff window
    ]
    df = spark.createDataFrame(
        [(i, b) for i, (b, _, _) in enumerate(rows)], "id int, body string"
    )
    got = {
        r["id"]: (r["sniff"], r["looks"])
        for r in df.select(
            "id", sniff_html("body").alias("sniff"), looks_like_html("body").alias("looks")
        ).collect()
    }
    for i, (_, want_sniff, want_looks) in enumerate(rows):
        assert got[i] == (want_sniff, want_looks), f"case {i}: {got[i]}"


def test_infer_doc_type_full_map(spark):
    """inferDocumentType parity (web.go:3404-3429): full docTypeMap,
    lowercased values, UNKNOWN fallback, query string stripped."""
    from thecrowler_spark.operators.content_type import DOC_TYPE_MAP, infer_doc_type

    assert len(DOC_TYPE_MAP) == 88  # the reference map has exactly 88 entries
    cases = [
        ("https://x.example.com/a.pdf", "application/pdf"),
        ("https://x.example.com/a.mp4", "application/mp4"),   # lowered from MP4
        ("https://x.example.com/a.webm", "application/webm"),
        ("https://x.example.com/a.xhtml", "text/xhtml"),
        ("https://x.example.com/a.woff2", "application/woff2"),
        ("https://x.example.com/a.7z", "application/7z"),
        ("https://x.example.com/a.pdf?v=1", "application/pdf"),  # query stripped
        ("https://x.example.com/a.nope", "UNKNOWN"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    got = df.select("want", infer_doc_type("url").alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"], (r["want"], r["got"])
