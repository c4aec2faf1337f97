"""OPIC — On-line Page Importance Computation (Abiteboul, Preda,
Cobena, WWW 2003) as the frontier's adaptive priority signal.

The reference's frontier orders claims by a static priority string +
FIFO (``update_sources`` /root/reference/pkg/database/
postgresql-setup.pgsql:2826-2898, ORDER BY at :2887); the classic
adaptive upgrade is OPIC: every page holds *cash*, distributes it to
its out-links when crawled, and accumulates *history* (total cash ever
spent) — ``history + cash`` converges to a PageRank-like importance
that can be maintained ONLINE while crawling, which is exactly what a
priority-queue frontier wants.  This module implements the synchronous
batch variant (every page distributes each round) so the iterative
algorithm is deterministic and carries a full unrolled-CTE SQL oracle,
same contract as :func:`.linkgraph.pagerank_fixedpoint`.

Determinism contract (the repo's fixed-point rules):

- all arithmetic is exact int64: per-edge contribution is
  ``cash DIV outdeg``; the flooring remainder ``cash % outdeg`` is NOT
  lost — it leaks to a **virtual node** (the paper's treatment of
  dangling pages, §5), together with the entire cash of pages with no
  out-links;
- each round the virtual node redistributes its pot uniformly:
  ``share = pot DIV N`` to every page, keeping ``pot % N`` for the
  next round.  Total mass ``sum(cash) + pot`` is conserved EXACTLY at
  every round (``N * (scale DIV N)``), which the tests assert;
- integer sums are order-independent → bit-identical across
  partitionings and across engines (DuckDB ``//``/``%`` ≡ Spark
  ``DIV``/``%`` on the non-negative values used here).

Scale notes (10^10-node web graph):

- one round = one ``src``-key equi-join of the (node, cash) table to
  edges + one ``dst``-key groupBy with map-side partial sums — hot
  pages (huge in-degree) are aggregation skew, absorbed map-side; no
  window functions anywhere;
- the virtual pot and N enter the plan as broadcast 1-row aggregates —
  no ``collect()``;
- the state table is (node, cash, hist) int64 triples — tiny relative
  to edges; ``persist_each`` (AUTO on past 5 iterations, like the
  PageRank/HITS siblings) localCheckpoints it so lineage does not
  double per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def opic_importance(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 1_000_000_000,
    src: str = "src",
    dst: str = "dst",
    persist_each: bool | None = None,
) -> DataFrame:
    """Synchronous OPIC over a (src, dst) edge list, exact int64.

    cash_0(v) = scale DIV N, hist_0(v) = 0, pot_0 = 0; each round::

        to(v)    = Σ_{(u,v)∈E} cash(u) DIV outdeg(u)
        leak     = Σ_{outdeg(u)=0} cash(u) + Σ_{outdeg(u)>0} cash(u) % outdeg(u)
        share    = pot DIV N
        cash'(v) = to(v) + share
        hist'(v) = hist(v) + cash(v)
        pot'     = leak + pot % N

    Output: ``(node, cash_fp, hist_fp, imp_fp)`` with
    ``imp_fp = hist_fp + cash_fp`` — the paper's importance estimate
    (H + C, up to the constant 1/(G+1) normalization).  Multi-edges
    contribute once each (outdeg counts them too).
    """
    if persist_each is None:
        # AUTO on past ONE iteration (r6): each round references the
        # state THREE times (contribution join, leak aggregate, history
        # update), so un-truncated lineage re-executes ~3^rounds — the
        # sf0.1 fixture measured 90 s at n_iter=5 vs ~3 s checkpointed.
        # (The pagerank sibling keeps its >5 rule: its round references
        # the rank exactly once, so its lineage is linear.)
        persist_each = n_iter > 1
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    out_d = edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("od"))
    if persist_each:
        # the loop references edges twice per round (contribution join,
        # implicit in out_d already) and nodes/out_d every round; the
        # eager per-round checkpoints cut all lineage, so these caches
        # can be (and are) released before returning
        edges = edges.persist()
        nodes = nodes.persist()
        out_d = out_d.persist()
    # N enters via a broadcast 1-row aggregate — no collect()
    n_row = nodes.agg(F.count("*").alias("_n"))

    # 'L' suffixes: Spark SQL integer literals are 32-bit; the scaled
    # initial cash overflows INT under ANSI constant folding otherwise
    state = nodes.crossJoin(F.broadcast(n_row)).select(
        "node",
        F.expr(f"{scale}L DIV _n").alias("cash_fp"),
        F.lit(0).cast("long").alias("hist_fp"),
    )
    # virtual-node pot: a 1-row (v) DataFrame carried across rounds
    pot = nodes.agg(F.lit(0).cast("long").alias("_v")).limit(1)
    for _ in range(n_iter):
        cwd = state.join(out_d, "node", "left")  # (node, cash, hist, od)
        contrib = (
            edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst"))
            .join(cwd.select("node", "cash_fp", "od"), "node")
            .select(
                F.col("_dst").alias("node"),
                F.expr("cash_fp DIV od").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        leak = cwd.agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("od").isNull(), F.col("cash_fp")).otherwise(
                        F.expr("cash_fp % od")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("_leak")
        )
        vsplit = pot.crossJoin(F.broadcast(n_row)).select(
            F.expr("_v DIV _n").alias("_share"), F.expr("_v % _n").alias("_vrem")
        )
        state = (
            state.join(contrib, "node", "left")
            .crossJoin(F.broadcast(vsplit))
            .select(
                "node",
                (F.coalesce(F.col("c"), F.lit(0)) + F.col("_share"))
                .cast("long")
                .alias("cash_fp"),
                (F.col("hist_fp") + F.col("cash_fp")).alias("hist_fp"),
            )
        )
        pot = leak.crossJoin(F.broadcast(vsplit)).select(
            (F.col("_leak") + F.col("_vrem")).cast("long").alias("_v")
        )
        if persist_each:
            # localCheckpoint TRUNCATES the logical plan — without it the
            # analyzed plan doubles per round (see pagerank_fixedpoint)
            state = state.localCheckpoint(eager=True)
            pot = pot.localCheckpoint(eager=True)
    if persist_each:
        # the final state is a checkpointed RDD — its plan no longer
        # references these (r6: fixes the cache leak too)
        for df in (edges, nodes, out_d):
            df.unpersist()
    return state.select(
        "node",
        "cash_fp",
        "hist_fp",
        (F.col("cash_fp") + F.col("hist_fp")).alias("imp_fp"),
    )
