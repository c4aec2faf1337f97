"""Link-graph operators: degree stats and fixed-point PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators import linkgraph as LG

S = 1_000_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_degree_stats(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 1), (3, 4)])
    got = {r.node: (r.out_degree, r.in_degree) for r in LG.degree_stats(e).collect()}
    assert got == {1: (2, 1), 2: (1, 1), 3: (1, 1), 4: (0, 1)}


def test_pagerank_two_node_cycle_fixed_point(spark):
    # a<->b is PageRank's fixed point at rank 1/2 each; the integer
    # iteration must reproduce it exactly: (5e8*85)//100 + (1e9*15)//200
    e = _edges(spark, [(1, 2), (2, 1)])
    got = {r.node: r.rank_fp for r in LG.pagerank_fixedpoint(e, n_iter=3).collect()}
    assert got == {1: S // 2, 2: S // 2}


def test_pagerank_star_one_iteration_golden(spark):
    # a->b, a->c, b->a, c->a; hand-computed first iteration
    e = _edges(spark, [(1, 2), (1, 3), (2, 1), (3, 1)])
    got = {r.node: r.rank_fp for r in LG.pagerank_fixedpoint(e, n_iter=1).collect()}
    r0 = S // 3
    base = (S * 15) // 300
    to_leaf = (r0 * 85) // 200
    to_hub = (r0 * 85) // 100
    assert got == {1: base + 2 * to_hub, 2: base + to_leaf, 3: base + to_leaf}


def test_pagerank_mass_bounds_and_hub_ordering(spark):
    # ring + extra edges into node 0: node 0 must out-rank the rest;
    # total mass stays in (0.8*S, S] (only per-edge flooring is lost —
    # no dangling nodes in this graph)
    n = 50
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, 0) for i in range(1, n, 3)]
    e = _edges(spark, pairs)
    rank = LG.pagerank_fixedpoint(e, n_iter=5, persist_each=True)
    rows = {r.node: r.rank_fp for r in rank.collect()}
    total = sum(rows.values())
    assert 0.8 * S < total <= S
    assert rows[0] == max(rows.values())
    assert all(v > 0 for v in rows.values())


def test_hits_star_and_mass(spark):
    """Star graph u1..u4 -> c: c is the sole authority, spokes are the
    hubs; integer L1 mass lands within flooring slack of scale."""
    from thecrowler_spark.operators.linkgraph import hits_fixedpoint

    edges = spark.createDataFrame(
        [(f"u{i}", "c") for i in range(1, 5)], "src string, dst string"
    )
    rows = {r["node"]: (r["hub_fp"], r["auth_fp"]) for r in
            hits_fixedpoint(edges, n_iter=3, scale=1_000_000).collect()}
    assert rows["c"][1] > 0 and rows["c"][0] == 0      # authority only
    for i in range(1, 5):
        h, a = rows[f"u{i}"]
        assert h > 0 and a == 0                        # hubs only
    assert len({rows[f"u{i}"] for i in range(1, 5)}) == 1  # symmetric
    # normalized masses: each half-step renormalizes to ~scale
    assert abs(sum(a for _, a in rows.values()) - 1_000_000) <= 5
    assert abs(sum(h for h, _ in rows.values()) - 1_000_000) <= 5


def test_deep_iteration_auto_persist(spark):
    """20-iteration PageRank/HITS complete with bounded plans (auto
    persist_each beyond 5 iterations truncates the per-round lineage
    doubling) and PageRank matches a pure-int Python simulation."""
    from pyspark.sql import functions as F

    from thecrowler_spark.operators.linkgraph import hits_fixedpoint, pagerank_fixedpoint

    n = 30
    edge_list = [(u, (u * 7 + 3) % n) for u in range(n)] + [
        (u, (u * 13 + 5) % n) for u in range(n)
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")

    scale, damp, it = 1_000_000_000, 85, 20
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixedpoint(edges, n_iter=it, scale=scale).collect()
    }
    # pure-int simulation of the exact fixed-point recurrence
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    outd = {}
    for u, _ in edge_list:
        outd[u] = outd.get(u, 0) + 1
    rank = {v: scale // len(nodes) for v in nodes}
    base = (scale * (100 - damp)) // (100 * len(nodes))
    for _ in range(it):
        contrib = {v: 0 for v in nodes}
        for u, v in edge_list:
            contrib[v] += (rank[u] * damp) // (100 * outd[u])
        rank = {v: base + contrib[v] for v in nodes}
    assert got == rank

    # HITS at 20 iterations: completes with bounded plans and the L1
    # mass respects the integer-DIV norm invariant: norm divides by
    # max(t DIV scale, 1), which only shrinks once t ≥ 2×scale, so the
    # steady-state hub mass lands in (0, 2×scale)
    h = hits_fixedpoint(edges, n_iter=20, scale=1_000_000)
    tot = h.agg(F.sum("hub_fp").alias("t")).first()["t"]
    assert 0 < tot < 2_000_000


def test_anchor_texts_topk_and_counts(spark):
    """Per-target anchor aggregation: counts, distinct counts, and the
    (n desc, anchor asc) top-k order on a hand-checkable graph."""
    from thecrowler_spark.operators.linkgraph import anchor_texts

    links = spark.createDataFrame(
        [("t1", a) for a in ["home", "home", "home", "docs", "docs", "api", "blog"]]
        + [("t2", a) for a in ["zz", "aa"]],  # tie on n=1 -> anchor asc
        "dst string, anchor string",
    )
    out = {r["dst"]: r for r in anchor_texts(links, k=3).collect()}
    assert out["t1"]["n_links"] == 7 and out["t1"]["n_unique_anchors"] == 4
    assert out["t1"]["top_anchors"] == ["home", "docs", "api"]  # blog cut by k=3
    assert out["t2"]["n_links"] == 2
    assert out["t2"]["top_anchors"] == ["aa", "zz"]
