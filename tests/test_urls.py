"""URL kernel parity: Spark Column expressions vs the transcription oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.functions import urls as U
from tests import oracle as O

CASES = [
    "https://Example.COM/Path/",
    "  https://example.com/a//  ",
    "http://example.com",
    "HTTP://example.com/x",  # case-sensitive scheme check → invalid
    "ftp://files.example.com/f.txt",
    "ftps://files.example.com/",
    "example.com/no-scheme",
    "/relative/path",
    "http://",
    "",
    "   ",
    "ht tp://x.example.com",
    "https://sub.a.example.co.uk/deep/path?q=1",
    "https://example.com/p1///",
    "wss://ws.example.com/sock",  # ws not in allowedProtocols → invalid
    "https://h0.example.com/p3",
]


def _run(spark, expr_builder, pycases):
    df = spark.createDataFrame([(c,) for c in CASES], "u string")
    got = [r[0] for r in df.select(expr_builder(F.col("u"))).collect()]
    assert got == pycases


def test_normalize_url_seen(spark):
    _run(spark, U.normalize_url_seen, [O.normalize_url_seen(c) for c in CASES])


def test_normalize_link(spark):
    _run(spark, U.normalize_link, [O.normalize_link(c) for c in CASES])


def test_is_valid_url(spark):
    _run(spark, U.is_valid_url, [O.is_valid_url(c) for c in CASES])


def test_url_to_host_and_hostname(spark):
    _run(spark, U.url_hostname, [O.hostname(c) for c in CASES])


def test_combine_urls(spark):
    base = "https://h1.example.com/p0"
    links = ["/p3", "/private/s0", "https://other.org/x", "p9", "/"]
    df = spark.createDataFrame([(base, l) for l in links], "b string, l string")
    got = [r[0] for r in df.select(U.combine_urls("b", "l")).collect()]
    assert got == [O.combine_urls(base, l) for l in links]


def test_is_external_link_levels(spark):
    src = "https://www.example.com/home"
    links = [
        "https://www.example.com/home/sub",
        "https://www.example.com/other",
        "https://blog.example.com/x",
        "https://example.org/x",
        "/relative",
        "https://www.example.com/home",
    ]
    for level in range(5):
        df = spark.createDataFrame(
            [(src, l, level) for l in links], "s string, l string, lvl int"
        )
        got = [r[0] for r in df.select(U.is_external_link("s", "l", "lvl")).collect()]
        want = [O.is_external_link(src, l, level) for l in links]
        assert got == want, f"level={level}: {got} != {want}"
