"""Robots.txt enforcement operators (north-rule mode).

The reference declares robots but never enforces it
(/root/reference/pkg/config/types.go:111 never read; SURVEY.md §7 trap
7) — these are our enforcement semantics, RFC 9309: longest matching
prefix wins, allow beats disallow on ties, no match → allow.

Two shapes:

- :func:`robots_verdict` — full allow/disallow verdict via a
  broadcast join + per-URL window (used by the crawl engine where the
  rule table mixes allow + disallow).
- :func:`disallow_prefix_filter` — the fast path when rules are
  disallow-only: aggregate prefixes per host (tiny), broadcast,
  single equi-join on host, ``exists()`` array probe. No non-equi
  join condition anywhere, so Catalyst never falls back to a
  nested-loop join — this is the 10^10-URL shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_path_expr(url_col) -> F.Column:
    p = F.regexp_replace(url_col, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def disallow_prefix_filter(
    links: DataFrame,
    robots: DataFrame,
    url_col: str = "url_link",
    host_col: str = "host",
) -> DataFrame:
    """Drop links whose path matches any disallow prefix of their host.

    ``robots(host, rule_type, path_prefix)`` with disallow-only
    semantics (no allow overrides). One broadcast equi-join + one
    vectorized array probe.
    """
    prefixes = (
        robots.filter(F.col("rule_type") == "disallow")
        .groupBy("host")
        .agg(F.collect_list("path_prefix").alias("_dis_prefixes"))
        .withColumnRenamed("host", "_rhost")
    )
    joined = links.join(
        F.broadcast(prefixes), links[host_col] == F.col("_rhost"), "left"
    )
    path = url_path_expr(F.col(url_col))
    blocked = F.when(
        F.col("_dis_prefixes").isNotNull(),
        F.exists("_dis_prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    return joined.filter(~blocked).drop("_rhost", "_dis_prefixes")
