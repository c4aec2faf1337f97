"""Crawl-order + URL-seen + counter parity: Spark engine vs Python oracle.

The graded invariants (BASELINE.json north_rule): same seed list +
politeness settings ⇒ identical crawl ordering and final URL-seen set.
"""

from __future__ import annotations

import pytest

from thecrowler_spark.operators.frontier import CrawlConfig, CrawlEngine
from thecrowler_spark.sources.corpus import CorpusSpec, corpus_to_spark, small_corpus
from tests import oracle as O


def _spark_result(spark, corpus, cfg: CrawlConfig, robots=False):
    dfs = corpus_to_spark(spark, corpus)
    eng = CrawlEngine(
        spark,
        dfs["documents"],
        cfg=cfg,
        robots=dfs["robots_rules"] if robots else None,
    )
    return eng.run(dfs["seeds"])


def _oracle_result(corpus, ocfg: O.OracleConfig):
    return O.crawl_all(
        corpus["documents"], corpus["seeds"], ocfg, robots=corpus["robots_rules"]
    )


def _compare(res, want):
    got_order = sorted(
        (r["source_id"], r["seq"], r["depth"], r["url"])
        for r in res.crawl_order.collect()
    )
    assert got_order == sorted(want.crawl_order)
    got_seen = {(r["source_id"], r["norm_url"]) for r in res.visited.collect()}
    assert got_seen == want.visited
    for sid, oc in want.counters.items():
        gc = res.counters.get(sid)
        assert gc is not None, f"missing counters for source {sid}"
        for k in ("pages", "skipped", "duplicates", "errors", "links"):
            assert gc[k] == oc[k], f"source {sid} counter {k}: spark={gc[k]} oracle={oc[k]}"


PARAMS = [
    dict(max_depth=1, max_links=0),
    dict(max_depth=2, max_links=0),
    dict(max_depth=3, max_links=0),
    dict(max_depth=0, max_links=0),   # unbounded-while-new
    dict(max_depth=3, max_links=7),   # cutoff + truncation
    dict(max_depth=2, max_links=1),
]


@pytest.mark.parametrize("p", PARAMS, ids=[f"d{p['max_depth']}_l{p['max_links']}" for p in PARAMS])
def test_crawl_parity(spark, p):
    corpus = small_corpus(CorpusSpec(n_hosts=3, pages_per_host=12, skew_host_factor=3))
    cfg = CrawlConfig(max_depth=p["max_depth"], max_links=p["max_links"], max_rounds=12)
    ocfg = O.OracleConfig(max_depth=p["max_depth"], max_links=p["max_links"], max_rounds=12)
    _compare(_spark_result(spark, corpus, cfg), _oracle_result(corpus, ocfg))


def test_crawl_parity_robots(spark):
    corpus = small_corpus(CorpusSpec(n_hosts=2, pages_per_host=10))
    cfg = CrawlConfig(max_depth=2, check_robots=True, max_rounds=8)
    ocfg = O.OracleConfig(max_depth=2, check_robots=True, max_rounds=8)
    _compare(
        _spark_result(spark, corpus, cfg, robots=True), _oracle_result(corpus, ocfg)
    )


def test_crawl_parity_restriction_levels(spark):
    corpus = small_corpus(CorpusSpec(n_hosts=2, pages_per_host=8))
    for lvl in (0, 1, 2, 3, 4):
        for s in corpus["seeds"]:
            s["restricted"] = lvl
        cfg = CrawlConfig(max_depth=2, max_rounds=6)
        ocfg = O.OracleConfig(max_depth=2, max_rounds=6)
        _compare(_spark_result(spark, corpus, cfg), _oracle_result(corpus, ocfg))


def test_crawl_parity_bloom_prefilter(spark):
    """Bloom-accelerated URL-seen path must be result-identical."""
    corpus = small_corpus(CorpusSpec(n_hosts=2, pages_per_host=12))
    cfg = CrawlConfig(max_depth=3, max_rounds=8, bloom_prefilter=True)
    ocfg = O.OracleConfig(max_depth=3, max_rounds=8)
    _compare(_spark_result(spark, corpus, cfg), _oracle_result(corpus, ocfg))
