"""OPIC (Abiteboul WWW'03) — goldens, mass conservation, pure-Python
cross-check, and the claim-gate priority valve."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from thecrowler_spark.operators.opic import opic_importance

S = 1_000_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _py_opic(pairs, n_iter, scale=S):
    """Pure-Python reference of the synchronous OPIC recurrence."""
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    n = len(nodes)
    od = {}
    for u, _ in pairs:
        od[u] = od.get(u, 0) + 1
    cash = {v: scale // n for v in nodes}
    hist = {v: 0 for v in nodes}
    pot = 0
    for _ in range(n_iter):
        to = {v: 0 for v in nodes}
        leak = 0
        for u in nodes:
            d = od.get(u, 0)
            if d == 0:
                leak += cash[u]
            else:
                leak += cash[u] % d
        for u, v in pairs:
            to[v] += cash[u] // od[u]
        share, vrem = pot // n, pot % n
        for v in nodes:
            hist[v] += cash[v]
        cash = {v: to[v] + share for v in nodes}
        pot = leak + vrem
    return {v: (cash[v], hist[v], cash[v] + hist[v]) for v in nodes}, pot


def test_opic_two_node_cycle_golden(spark):
    # a<->b: cash never leaks (od=1, no remainder); each round the full
    # cash swaps sides, history grows by S//2 per round per node.
    e = _edges(spark, [(1, 2), (2, 1)])
    got = {r.node: (r.cash_fp, r.hist_fp, r.imp_fp) for r in opic_importance(e, n_iter=3).collect()}
    c = S // 2
    assert got == {1: (c, 3 * c, 4 * c), 2: (c, 3 * c, 4 * c)}


def test_opic_dangling_node_leaks_to_virtual_pot(spark):
    # 1->2, 2 dangling: round 1 moves 2's cash to the pot; round 2
    # redistributes pot//2 to both. Hand-computed 2 rounds.
    e = _edges(spark, [(1, 2)])
    got = {r.node: (r.cash_fp, r.hist_fp) for r in opic_importance(e, n_iter=2).collect()}
    c0 = S // 2
    # round 1: to(2)=c0 (od(1)=1, no remainder), leak=c0 (node 2 dangles),
    #          share=0 -> cash=(0, c0), hist=(c0, c0), pot=c0
    # round 2: to(2)=0 (node 1 has no cash), leak=c0 (node 2's cash),
    #          share=c0//2 -> cash=(share, share), hist=(c0, 2*c0)
    sh = c0 // 2
    assert got == {1: (sh, c0), 2: (sh, 2 * c0)}


def test_opic_mass_conservation_and_crosscheck(spark):
    # random graph incl. danglers and multi-edges: Spark == pure Python
    # node-for-node, and sum(cash)+pot is conserved exactly (checked in
    # the Python twin; Spark must match it, so conservation transfers).
    rng = random.Random(7)
    n = 40
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    pairs += [(n + 1, 0), (0, n + 1)]  # guarantee an isolated-ish pair
    want, pot = _py_opic(pairs, n_iter=4)
    total0 = len({u for u, _ in pairs} | {v for _, v in pairs})
    total0 *= S // total0
    assert sum(c for c, _, _ in want.values()) + pot == total0
    got = {
        r.node: (r.cash_fp, r.hist_fp, r.imp_fp)
        for r in opic_importance(_edges(spark, pairs), n_iter=4).collect()
    }
    assert got == want


def test_opic_hub_outranks_spokes(spark):
    # ring + extra in-edges to node 0 (same shape as the pagerank test):
    # OPIC importance must agree that node 0 dominates.
    n = 30
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, 0) for i in range(1, n, 3)]
    rows = {r.node: r.imp_fp for r in opic_importance(_edges(spark, pairs), n_iter=6).collect()}
    assert rows[0] == max(rows.values())
    assert all(v > 0 for v in rows.values())


def test_claim_sources_opic_priority_valve(spark):
    """claim_sources(importance=...) orders by imp desc before FIFO;
    default (None) stays reference-parity FIFO."""
    from thecrowler_spark.operators.frontier import claim_sources

    from datetime import datetime

    seeds = spark.createDataFrame(
        [
            (1, "u1", "https://a.example.com", "0", "new", 2, False, datetime(2024, 1, 1, 0, 0, 1)),
            (2, "u2", "https://b.example.com", "0", "new", 2, False, datetime(2024, 1, 1, 0, 0, 2)),
            (3, "u3", "https://c.example.com", "0", "new", 2, False, datetime(2024, 1, 1, 0, 0, 3)),
        ],
        "source_id long, source_uid string, url string, priority string, "
        "status string, restricted int, disabled boolean, created_at timestamp",
    )
    imp = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99)], "source_id long, imp_fp long"
    )
    fifo = [r.source_id for r in claim_sources(seeds, limit=3).collect()]
    assert fifo == [1, 2, 3]
    got = [r.source_id for r in claim_sources(seeds, limit=3, importance=imp).collect()]
    # ties (2,3 at 99) break on created_at FIFO; unscored/low last
    assert got == [2, 3, 1]
    # sources missing from the importance table rank as 0, below scored
    imp2 = spark.createDataFrame([(3, 5)], "source_id long, imp_fp long")
    got2 = [r.source_id for r in claim_sources(seeds, limit=2, importance=imp2).collect()]
    assert got2 == [3, 1]


def test_opic_seed_claim_resumes_crawl_at_the_richest_frontier(spark):
    """--opic-from wiring: the next run's seeds are the
    discovered-but-uncrawled pages ranked by OPIC importance over the
    prior crawl's observed link graph — equal to an independent
    recompute (opic_importance + pandas sort), and never a page the
    prior run already fetched."""
    from jobs.crawl_job import opic_seed_claim
    from thecrowler_spark.sources.corpus import big_corpus_df

    docs = big_corpus_df(spark, n_docs=80, n_hosts=5, links_per_page=3)
    # prior run "crawled" the 10 lowest page ids
    pid = F.regexp_extract("doc_id", r"p([0-9]+)$", 1).cast("long")
    prior = (
        docs.select("doc_id", pid.alias("p"))
        .filter(F.col("p") < 10)
        .select(F.col("doc_id").alias("url"))
    )

    claimed = opic_seed_claim(spark, docs, prior, n_seeds=6, n_rounds=2)
    rows = claimed.collect()
    assert len(rows) == 6
    crawled_urls = {r.url for r in prior.collect()}
    assert not crawled_urls & {r.url for r in rows}

    # independent recompute of the expected order
    links = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr("filter(spans, s -> s.kind = 'link')")).alias("s"),
    ).select("src", F.col("s.media_ref").alias("dst"))
    edges = links.join(prior.select(F.col("url").alias("src")), "src", "left_semi")
    imp = {
        r.node: r.imp_fp for r in opic_importance(edges, n_iter=2).collect()
    }
    frontier = {
        r.dst for r in edges.select("dst").distinct().collect()
    } - crawled_urls
    import re

    def key(u):
        p = int(re.search(r"p([0-9]+)$", u).group(1))
        return (-imp.get(u, 0), p, p)

    expect = sorted(frontier, key=key)[:6]
    assert [r.url for r in rows] == expect
    # claimed frame carries the full seed schema the engine expects
    for c in ("source_id", "source_uid", "restricted", "status", "created_at"):
        assert c in claimed.columns
