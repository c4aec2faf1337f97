"""Crawl-trap detection: template goldens, flag thresholds, the
two-phase cap's keep-set, and broadcast/partial-agg plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thecrowler_spark.operators.traps import detect_traps, filter_trap_urls, url_template


def _templates(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(url_template(F.col("url"))).collect()]


def test_url_template_goldens(spark):
    got = _templates(
        spark,
        [
            "https://cal.Example.com/cal/2024/3/14?sid=99&d=x",
            "https://shop.example.com/item/7?session=deadbeef00112233",
            "https://h1.example.com/about",
            "http://h2.example.com/post?b=2&a=1",  # keys sorted
            "https://h3.example.com/u/ABCDEF1234abcdef99/x",  # hex run >= 8
        ],
    )
    assert got == [
        "cal.example.com/cal/{n}/{n}/{n}?d,sid",
        "shop.example.com/item/{n}?session",
        "h1.example.com/about",
        "h2.example.com/post?a,b",
        "h3.example.com/u/{x}/x",
    ]


def test_detect_traps_counts_distinct_urls(spark):
    rows = [(f"https://t.example.com/p/{i}",) for i in range(30)]  # 30 distinct
    rows += [("https://t.example.com/about",)] * 10  # 10 copies, 1 distinct
    df = spark.createDataFrame(rows, "url string")
    got = {
        r["template"]: (r["n_urls"], r["is_trap"])
        for r in detect_traps(df, min_urls=20).collect()
    }
    assert got["t.example.com/p/{n}"] == (30, True)
    assert got["t.example.com/about"] == (1, False)
    with pytest.raises(ValueError):
        detect_traps(df, min_urls=0)


def test_filter_caps_traps_only(spark):
    rows = [(i, f"https://t.example.com/p/{i:04d}") for i in range(40)]
    rows += [(100 + i, f"https://ok.example.com/page-{chr(97 + i)}x") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, url string")
    traps = detect_traps(df, min_urls=20)
    kept = filter_trap_urls(df, traps, cap_per_template=8, order_cols=("url", "id"))
    urls = sorted(r["url"] for r in kept.collect())
    # trap template capped to its 8 smallest (url, id); benign family intact
    assert [u for u in urls if "/p/" in u] == [
        f"https://t.example.com/p/{i:04d}" for i in range(8)
    ]
    assert len([u for u in urls if "ok.example.com" in u]) == 5
    assert set(kept.columns) == {"id", "url"}


def test_engine_trap_cap(spark):
    """CrawlConfig.trap_cap: a 30-URL calendar trap on one template is
    capped to 5 fetches while benign pages pass; default-off equals
    reference parity (all 34 fetched)."""
    from datetime import datetime, timezone

    from thecrowler_spark.operators.frontier import CrawlConfig, CrawlEngine
    from thecrowler_spark.sources.corpus import DOCUMENTS_SCHEMA, SEEDS_SCHEMA

    base = "https://trap.example.com"
    trap_links = [f"{base}/cal/2024/{i}?sid={i}" for i in range(30)]
    ok_links = [f"{base}/about-{c}" for c in "abc"]

    def spans(links):
        out = [("title", "t", "", 0)]
        out += [("link", f"l{i}", l, 1 + i) for i, l in enumerate(links)]
        return out

    rows = [(f"{base}/p0", spans(trap_links + ok_links))]
    rows += [(u, spans([])) for u in trap_links + ok_links]
    docs_df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    seeds = spark.createDataFrame(
        [(1, "u1", f"{base}/p0", "high", "new", 2, False, 0, "{}",
          datetime(2026, 1, 1, tzinfo=timezone.utc))],
        SEEDS_SCHEMA,
    )
    plain = CrawlEngine(spark, docs_df, cfg=CrawlConfig(max_depth=1)).run(seeds)
    assert plain.counters[1]["pages"] == 34

    capped = CrawlEngine(
        spark, docs_df, cfg=CrawlConfig(max_depth=1, trap_cap=5, trap_threshold=10)
    ).run(seeds, run_id="trapcap")
    assert capped.counters[1]["pages"] == 9  # seed + 5 capped + 3 benign
    fetched = {r["url"] for r in capped.pages.collect()}
    assert all(u in fetched for u in ok_links)
    # the kept trap URLs are the 5 smallest by (link, source_id) order
    assert sorted(u for u in fetched if "/cal/" in u) == sorted(trap_links)[:5]


def test_plan_shapes(spark):
    df = spark.createDataFrame(
        [(i, f"https://t.example.com/p/{i}") for i in range(10)], "id long, url string"
    )
    stats_plan = (
        detect_traps(df, min_urls=5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in stats_plan
    assert "partial_count" in stats_plan  # partial agg before the one shuffle

    traps = detect_traps(df, min_urls=5)
    filt_plan = (
        filter_trap_urls(df, traps, cap_per_template=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in filt_plan
    # the trap-budget dimension joins broadcast — the URL stream never
    # shuffles on the join key for it
    assert "BroadcastHashJoin" in filt_plan or "BroadcastExchange" in filt_plan
