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

from thecrowler_spark.functions import text as TX


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
    # bind the path extract once per row (HOF lambdas re-evaluate
    # captured outer expressions per element — see robots_verdict)
    blocked = F.when(
        F.col("_dis_prefixes").isNotNull(),
        TX.bind_once(
            url_path_expr(F.col(url_col)),
            lambda path: F.exists("_dis_prefixes", lambda p: path.startswith(p)),
        ),
    ).otherwise(F.lit(False))
    return joined.filter(~blocked).drop("_rhost", "_dis_prefixes")


def _wildcard_regex(p: F.Column) -> F.Column:
    """RFC 9309 §2.2.3 pattern → anchored regex: ``*`` matches any char
    sequence, a TRAILING ``$`` anchors the end of the path; everything
    else is literal. Built as Column expressions so rules stay DATA
    (the translation runs once per rule row at aggregation time, never
    per URL)."""
    anchored = p.endswith("$")
    body = F.when(anchored, F.substring(p, F.lit(1), F.length(p) - 1)).otherwise(p)
    # escape regex metachars EXCEPT '*' (it becomes '.*' below)
    escaped = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.replace(escaped, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def robots_verdict(
    links: DataFrame,
    robots: DataFrame,
    url_col: str = "url_link",
    host_col: str = "host",
) -> DataFrame:
    """Full RFC 9309 verdict over parser output (allow + disallow rows):
    longest matching pattern wins, allow beats disallow on equal length,
    no matching rule → allowed. Patterns may use the RFC's ``*``
    (any chars) and trailing ``$`` (end anchor) — wildcard rules are
    translated to anchored regexes ONCE at rule-aggregation time; plain
    prefixes keep the cheaper ``startswith`` probe. This is the
    operator to feed :func:`parse_robots_txt` rows into —
    :func:`disallow_prefix_filter` ignores allow rows and wildcards.

    Shape: rules aggregate to one array per host (tiny), broadcast,
    single equi-join on host, then a vectorized array reduction —
    ``array_max`` over (plen, is_allow) structs implements
    longest-pattern-wins with allow-on-tie in one expression. No
    non-equi join condition anywhere (the 10^10-URL shape).

    Returns the input plus ``robots_allowed`` boolean.
    """
    p = F.col("path_prefix")
    has_wild = p.contains("*") | p.endswith("$")
    rules = (
        robots.filter(F.col("rule_type").isin("allow", "disallow"))
        .groupBy("host")
        .agg(
            F.collect_list(
                F.struct(
                    F.length("path_prefix").alias("plen"),
                    (F.col("rule_type") == "allow").cast("int").alias("is_allow"),
                    F.col("path_prefix").alias("prefix"),
                    F.when(has_wild, _wildcard_regex(p)).alias("wild"),
                )
            ).alias("_rules")
        )
        .withColumnRenamed("host", "_rhost")
    )
    joined = links.join(F.broadcast(rules), links[host_col] == F.col("_rhost"), "left")

    # bind the path ONCE per row: HOF lambdas re-evaluate captured outer
    # expressions per element, so referencing the regex extract directly
    # inside the filter would re-extract the path per rule (and the
    # match array is consumed twice below, doubling it again)
    def verdict(path: F.Column) -> F.Column:
        matched = F.filter(
            F.col("_rules"),
            lambda r: F.when(
                r["wild"].isNotNull(), F.regexp_like(path, r["wild"])
            ).otherwise(path.startswith(r["prefix"])),
        )

        def decide(m: F.Column) -> F.Column:
            # struct compare: plen, then is_allow (allow wins tie)
            return F.when(F.size(m) == 0, F.lit(True)).otherwise(
                F.array_max(m)["is_allow"] == 1
            )

        return TX.bind_once(matched, decide)

    allowed = F.when(F.col("_rules").isNull(), F.lit(True)).otherwise(
        TX.bind_once(url_path_expr(F.col(url_col)), verdict)
    )
    return joined.withColumn("robots_allowed", allowed).drop("_rhost", "_rules")


def crawl_delay_budgets(robots_rules: DataFrame, round_duration_s: float = 60.0) -> DataFrame:
    """Route the parser's ``crawl_delay`` rows into per-host politeness
    budgets: a host declaring Crawl-delay d gets
    ``floor(round_duration / max(d, 3s))`` fetches per round, min 1
    (:func:`..operators.politeness.budgets_from_intervals` math). The
    most conservative (largest) delay wins when groups repeat it.
    Output plugs straight into ``CrawlEngine(budgets=...)``.
    """
    from .politeness import budgets_from_intervals

    delays = (
        robots_rules.filter(F.col("rule_type") == "crawl_delay")
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("interval_seconds"))
    )
    return budgets_from_intervals(delays, round_duration_s=round_duration_s)


def parse_robots_txt(
    robots_docs: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """robots.txt bodies → (host, rule_type, path_prefix, crawl_delay)
    rule rows, RFC 9309 grouping semantics.

    Vectorized pandas UDF (one robots.txt is small; the corpus of them
    is huge — per-host parse is the right batch unit). RFC 9309 §2.2.1
    group selection: the MOST SPECIFIC matching group wins — if any
    group names ``user_agent`` exactly, only those groups apply and the
    ``*`` groups are ignored; ``*`` groups apply only as the fallback.
    Allow/Disallow/Crawl-delay collected from the selected groups;
    empty Disallow ("allow all") is dropped.
    """
    from collections.abc import Iterator

    import pandas as pd

    out_schema = "host string, rule_type string, path_prefix string, crawl_delay double"

    def parse_one(host: str, txt: str) -> list[tuple]:
        if not txt:
            return []
        ua = user_agent.lower()
        # pass 1: split into (agents, lines) groups
        groups: list[tuple[list[str], list[tuple[str, str]]]] = []
        agents: list[str] = []
        body: list[tuple[str, str]] = []
        in_body = False
        for raw in txt.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, val = line.split(":", 1)
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if in_body:
                    groups.append((agents, body))
                    agents, body, in_body = [], [], False
                agents.append(val.lower())
            elif key in ("allow", "disallow", "crawl-delay"):
                in_body = True
                body.append((key, val))
        if agents or body:
            groups.append((agents, body))
        # pass 2: most-specific group selection (RFC 9309 §2.2.1)
        specific = [g for g in groups if ua in g[0]]
        selected = specific if specific else [g for g in groups if "*" in g[0]]
        rules: list[tuple] = []
        for _agents, glines in selected:
            for key, val in glines:
                if key == "crawl-delay":
                    try:
                        rules.append((host, "crawl_delay", "", float(val)))
                    except ValueError:
                        pass
                elif val:  # empty Disallow == allow-all → no rule
                    rules.append((host, key, val, 0.0))
        return rules

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for h, t in zip(pdf[host_col], pdf[body_col]):
                rows.extend(parse_one(h, t))
            yield pd.DataFrame(
                rows, columns=["host", "rule_type", "path_prefix", "crawl_delay"]
            )

    return robots_docs.mapInPandas(batches, out_schema)
