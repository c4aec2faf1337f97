"""DUST rule mining (Bar-Yossef et al. WWW'07): learned
content-irrelevant params, contradiction handling, and rule-applying
canonicalization."""

from __future__ import annotations

import pytest

from thecrowler_spark.operators.dust import apply_dust_rules, dust_rules


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_dust_learns_session_param(spark):
    # sid varies, content doesn't -> rule. page param IS content-bearing.
    rows = []
    for page in range(3):
        for sid in range(3):
            rows.append(
                (f"https://a.example.com/p?page={page}&sid={sid}", f"h{page}")
            )
    got = {
        (r["host"], r["param"]): (r["support"], r["contradictions"], r["is_rule"])
        for r in dust_rules(_pages(spark, rows), min_support=3).collect()
    }
    assert got[("a.example.com", "sid")] == (3, 0, True)
    # page: witness base fixes sid; each (page-removed, sid) group has 3
    # distinct URLs with 3 distinct hashes -> contradiction, never a rule.
    sup, con, rule = got[("a.example.com", "page")]
    assert con > 0 and not rule


def test_dust_no_support_no_rule(spark):
    # Only one URL per witness base: nothing to learn from.
    rows = [(f"https://b.example.com/p{i}?ref={i}", f"h{i}") for i in range(5)]
    got = {r["param"]: r for r in dust_rules(_pages(spark, rows)).collect()}
    assert got["ref"]["support"] == 0 and not got["ref"]["is_rule"]


def test_dust_min_support_threshold(spark):
    rows = [
        ("https://c.example.com/p?sid=1", "h"),
        ("https://c.example.com/p?sid=2", "h"),
    ]
    low = dust_rules(_pages(spark, rows), min_support=1).collect()[0]
    hi = dust_rules(_pages(spark, rows), min_support=2).collect()[0]
    assert low["is_rule"] and not hi["is_rule"]
    with pytest.raises(ValueError):
        dust_rules(_pages(spark, rows), min_support=0)


def test_dust_rules_per_host(spark):
    # sid is a rule on host a (content constant) but NOT on host b
    # (content tracks sid there) -- rules must stay host-scoped.
    rows = [(f"https://a.example.com/p?sid={i}", "same") for i in range(3)]
    rows += [(f"https://b.example.com/p?sid={i}", f"h{i}") for i in range(3)]
    got = {
        (r["host"], r["param"]): r["is_rule"]
        for r in dust_rules(_pages(spark, rows), min_support=1).collect()
    }
    assert got[("a.example.com", "sid")] is True
    assert got[("b.example.com", "sid")] is False


def _engine_docs(spark):
    a = "https://a.example.com/p0"
    b1 = "https://a.example.com/b?sid=1"
    b2 = "https://a.example.com/b?sid=2"
    c = "https://a.example.com/c"

    def doc(url, links):
        spans = [("title", f"t {url}", "", 0)] + [
            ("link", f"l{i}", l, i + 1) for i, l in enumerate(links)
        ]
        return (url, spans)

    docs = spark.createDataFrame(
        [doc(a, [b1, b2, c]), doc(b1, []), doc(b2, []), doc(c, [])],
        "doc_id string, spans array<struct<kind string, text string,"
        " media_ref string, offset int>>",
    )
    return docs, a, b1, b2, c


def test_engine_dust_valve_collapses_learned_params(spark):
    """CrawlEngine(dust_rules=...): mined sid rule collapses ?sid=
    variants in the URL-SEEN key — one fetch + one duplicate instead of
    two fetches; valve off = reference parity (both fetched)."""
    from pyspark.sql import functions as F

    from thecrowler_spark.operators.frontier import CrawlConfig, CrawlEngine

    docs, a, b1, b2, c = _engine_docs(spark)
    seeds = spark.createDataFrame(
        [(1, a, 2, "high", "new", False, "2026-01-01 00:00:00")],
        "source_id long, url string, restricted int, priority string,"
        " status string, disabled boolean, created_at string",
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    cfg = CrawlConfig(max_depth=2, max_rounds=4)

    base = CrawlEngine(spark, docs, cfg=cfg).run(seeds)
    assert {r["url"] for r in base.pages.collect()} == {a, b1, b2, c}
    assert base.counters[1]["duplicates"] == 0

    # prior-run fetch log: the two sid variants shared one content hash
    log = spark.createDataFrame(
        [(b1, "h_b"), (b2, "h_b")], "url string, content_hash string"
    )
    rules = dust_rules(log, min_support=1)
    res = CrawlEngine(spark, docs, cfg=cfg, dust_rules=rules).run(seeds)
    got = {r["url"] for r in res.pages.collect()}
    assert got == {a, b1, c}  # first variant fetched, second deduped
    assert res.counters[1]["duplicates"] == 1
    # seen key is the DUST-canonical form (no sid, no '?')
    vis = {r["norm_url"] for r in res.visited.collect()}
    assert "https://a.example.com/b" in vis
    assert not any("sid=" in v for v in vis)


def test_apply_dust_rules_canonicalizes(spark):
    rows = [(f"https://a.example.com/p?b=1&sid={i}", "same") for i in range(3)]
    rows += [("https://a.example.com/only?sid=9", "same2")]
    pages = _pages(spark, rows)
    rules = dust_rules(pages, min_support=1)
    got = {
        r["url"]: r["canonical_url"]
        for r in apply_dust_rules(pages, rules).collect()
    }
    assert got["https://a.example.com/p?b=1&sid=0"] == "https://a.example.com/p?b=1"
    # all sid variants collapse to one canonical form
    assert len({got[f"https://a.example.com/p?b=1&sid={i}"] for i in range(3)}) == 1
    # '?' dropped when no params survive
    assert got["https://a.example.com/only?sid=9"] == "https://a.example.com/only"
    # unknown host passes through untouched (params sorted, that's all)
    other = _pages(spark, [("https://z.example.com/q?x=1", "h")])
    kept = apply_dust_rules(other, rules).collect()[0]["canonical_url"]
    assert kept == "https://z.example.com/q?x=1"
