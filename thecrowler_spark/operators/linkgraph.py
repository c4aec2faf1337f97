"""Link-graph analytics: degree stats + fixed-point PageRank.

The reference stores the extracted link graph inside WebObjects details
(/root/reference/pkg/crawler/crawler.go:1394-1559 keeps ``links`` in the
page JSON) and uses it only for navigation; at corpus scale the link
graph is also the standard crawl-prioritization / spam-signal input, so
this module provides the two canonical graph operators a web-scale
pipeline needs.

Determinism contract: PageRank here is computed in **fixed-point
integer arithmetic** (rank mass scaled to ``scale``; every edge
contribution is ``(rank * damping_pct) DIV (100 * out_degree)`` in
int64). Integer addition is associative and commutative, so the result
is bit-identical regardless of partitioning — and identical in DuckDB,
which lets an iterative graph algorithm carry a full SQL oracle
(unrolled per-iteration CTEs). Dangling mass (nodes without out-edges)
is dropped, and per-edge flooring loses ≤1 unit per in-edge — both
deliberate, both mirrored exactly by the oracle.

Scale notes (100 TB / 10^10 nodes):
- each iteration = one equi-join of the rank table to edges on ``src``
  (both sides pre-partitioned on the join key reuse the exchange across
  iterations) + one groupBy ``dst`` with map-side partial sums;
- hot pages (huge in-degree) are pure aggregation skew — partial
  aggregation absorbs them; no window functions anywhere;
- the rank table is (node, int64) — tiny relative to edges; iterations
  should persist/checkpoint it (``persist_each`` arg) so lineage does
  not deepen linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree over a (src, dst) edge list.

    One aggregation per direction + a full outer join on node id;
    nodes appearing only on one side get 0 for the other degree.
    """
    out_d = edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 1_000_000_000,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    persist_each: bool | None = None,
) -> DataFrame:
    """PageRank power iteration in exact int64 fixed point.

    rank_0(v)   = scale DIV N
    rank_k+1(v) = (scale·(100−damping_pct)) DIV (100·N)
                  + Σ_{(u,v)∈E} (rank_k(u)·damping_pct) DIV (100·outdeg(u))

    Output: (node, rank_fp) — divide by ``scale`` for the float rank.
    Multi-edges contribute once each (outdeg counts them too), matching
    a repeated-link vote. ``persist_each`` persists the rank table per
    iteration to truncate lineage (the unpersisted plan DOUBLES per
    round — exponential beyond a handful of iterations). Default None =
    AUTO: on when ``n_iter > 5`` so a deep-iteration caller can't hit
    the exponential-plan footgun by omission.
    """
    if persist_each is None:
        persist_each = n_iter > 5
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    out_d = edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("od"))
    if persist_each:
        # nodes/out_d are referenced in every iteration's subplan —
        # materialize once instead of k recomputes of the distinct
        nodes = nodes.persist()
        out_d = out_d.persist()
    # N enters the plan via a broadcast 1-row aggregate — no collect()
    n_row = nodes.agg(F.count("*").alias("_n"))

    # 'L' suffixes: Spark SQL integer literals are 32-bit and the scaled
    # products overflow INT under ANSI constant folding otherwise
    rank = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", F.expr(f"{scale}L DIV _n").alias("rank_fp")
    )
    base = F.expr(f"({scale}L * {100 - damping_pct}L) DIV (100L * _n)")
    for _ in range(n_iter):
        contrib = (
            edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst"))
            .join(rank, "node")
            .join(out_d, "node")
            .select(
                F.col("_dst").alias("node"),
                F.expr(f"(rank_fp * {damping_pct}L) DIV (100L * od)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                (base + F.coalesce(F.col("c"), F.lit(0))).alias("rank_fp"),
            )
        )
        if persist_each:
            # localCheckpoint TRUNCATES the logical plan (persist alone
            # keeps the full lineage in the plan tree, and 20 stacked
            # iterations of analyzed plan will OOM the driver before the
            # data does) — each round's plan restarts from the
            # checkpointed RDD
            rank = rank.localCheckpoint(eager=True)
    return rank


def hits_fixedpoint(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    persist_each: bool | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) in exact int64 fixed point.

    a_k(v) = norm( Σ_{u→v} h_{k−1}(u) ),  h_k(u) = norm( Σ_{u→v} a_k(v) )
    with ``norm(x) = x DIV max(total DIV scale, 1)`` — an integer L1
    normalization (total mass ≈ ``scale`` after each half-step) that
    avoids the ``x*scale`` product (which would overflow int64 at large
    node counts) and keeps every operation exact and order-independent,
    so the iterative algorithm carries a full SQL oracle exactly like
    :func:`pagerank_fixedpoint`. h_0 = ``scale`` everywhere.

    Same scale shape as PageRank: per-iteration equi-joins of a tiny
    score table to edges + partial-agg sums; hub/authority skew is
    aggregation skew, absorbed map-side. Output:
    (node, hub_fp, auth_fp). ``persist_each`` default None = AUTO: on
    when ``n_iter > 5`` (lineage doubles per round otherwise — see
    :func:`pagerank_fixedpoint`).
    """
    if persist_each is None:
        # AUTO on past ONE iteration (r6): each half-step references its
        # normalized table twice (total + output), so un-truncated
        # lineage re-executes ~2^(2*rounds) — measured 64 s lazy vs
        # 10-13 s checkpointed at n_iter=3 on the sf0.1 fixture.
        persist_each = n_iter > 1
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    if persist_each:
        edges = edges.persist()
        nodes = nodes.persist()
    norm_expr = (
        f"s DIV (CASE WHEN t DIV {scale}L < 1 THEN 1 ELSE t DIV {scale}L END)"
    )

    def _half(score: DataFrame, score_col: str, from_col: str, to_col: str, out: str):
        raw = (
            edges.select(F.col(from_col).alias("node"), F.col(to_col).alias("_to"))
            .join(score, "node")
            .groupBy(F.col("_to").alias("node"))
            .agg(F.sum(score_col).alias("s"))
        )
        full = nodes.join(raw, "node", "left").select(
            "node", F.coalesce("s", F.lit(0)).alias("s")
        )
        # total over raw == total over full (nodes absent from raw
        # contribute coalesce(s,0)=0; every raw node is in nodes), so
        # the normalizer's branch re-executes the shallower subtree (r6)
        tot = raw.agg(F.coalesce(F.sum("s"), F.lit(0)).cast("long").alias("t"))
        return full.crossJoin(F.broadcast(tot)).select(
            "node", F.expr(norm_expr).alias(out)
        )

    h = nodes.select("node", F.lit(scale).cast("long").alias("hub_fp"))
    a = None
    for _ in range(n_iter):
        a = _half(h, "hub_fp", src, dst, "auth_fp")
        h = _half(a, "auth_fp", dst, src, "hub_fp")
        if persist_each:
            # plan truncation per round (see pagerank_fixedpoint)
            a = a.localCheckpoint(eager=True)
            h = h.localCheckpoint(eager=True)
    if persist_each:
        # h/a are checkpointed RDDs — lineage to these is cut (r6)
        edges.unpersist()
        nodes.unpersist()
    return h.join(a, "node").select("node", "hub_fp", "auth_fp")


def anchor_texts(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k: int = 5,
) -> DataFrame:
    """Per-target anchor-text aggregation — the link-context corpus
    builder (anchor text is standard supervision for retrieval/ranking
    training sets, and the reference's link extraction carries the
    link text the engine's spans expose).

    Scale shape: occurrence volume dies FIRST in a (dst, anchor)
    partial-agg count — a page with 10^8 inbound links arrives at its
    reducer as one row per DISTINCT anchor string, not per link — then
    a per-target window ranks anchors by (count desc, anchor asc; a
    total order) and keeps the top ``k``. The window partition is
    bounded by distinct-anchor cardinality per target, which the
    count stage already collapsed.

    Returns (dst, n_links, n_unique_anchors, top_anchors) where
    top_anchors is the rank-ordered top-k anchor list.
    """
    from pyspark.sql import Window

    counts = links.groupBy(dst_col, anchor_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(dst_col).orderBy(F.desc("n"), F.col(anchor_col))
    tops = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy(dst_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", F.col(anchor_col).alias("a")))),
                lambda s: s["a"],
            ).alias("top_anchors")
        )
    )
    stats = counts.groupBy(dst_col).agg(
        F.sum("n").cast("long").alias("n_links"),
        F.count("*").cast("long").alias("n_unique_anchors"),
    )
    return stats.join(tops, dst_col)
