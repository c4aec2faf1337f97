"""DUST rule mining: learn content-irrelevant URL parameters.

"Different URLs with Similar Text" (Bar-Yossef, Keidar & Schonfeld,
WWW'07 — "Do not crawl in the DUST") — a crawler that has fetched
``?sessionid=`` variants of the same page can *learn* that the
parameter never changes content and canonicalize it away, instead of
shipping a hand-maintained strip list (the reference hard-codes
infoseed's fbclid/gclid/utm_* set, /root/reference/pkg/agent/
candidates.go:264-297 — mirrored by ``CrawlConfig.strip_tracking``;
this operator is the learned generalization).

Mining is two grouped aggregations over the fetched-page log, all JVM:

1. explode each URL's query params; for param ``p`` the *witness base*
   is the URL with ``p`` removed (host + path + the other params,
   sorted). Group by (host, p, base): distinct URLs vs distinct
   content hashes.
2. Group by (host, p): ``support`` = witness groups where ≥2 distinct
   URLs share ONE content hash (p varied, content didn't);
   ``contradictions`` = groups where hashes differ (p is
   load-bearing). A rule needs ``support ≥ min_support`` and zero
   contradictions.

Scale: shuffle keys are (host, param, base) then (host, param) —
bounded fan-out per URL (its param count), partial-agg friendly, no
window, no UDF, nothing collected. Rules are a tiny per-host
dimension; :func:`apply_dust_rules` broadcasts them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dust_rules", "dust_param_dim", "canonicalize_with_dim", "apply_dust_rules"]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    min_support: int = 3,
) -> DataFrame:
    """Mine per-(host, param) content-irrelevance rules from a fetched
    (url, content_hash) log. Returns (host, param, support,
    contradictions, is_rule)."""
    if min_support <= 0:
        raise ValueError("min_support must be positive")
    url = F.col(url_col)
    parsed = pages.select(
        url.alias("_u"),
        F.col(hash_col).alias("_h"),
        F.lower(F.regexp_extract(url, _HOST_RE, 1)).alias("host"),
        F.regexp_extract(url, _PATH_RE, 1).alias("_path"),
        F.filter(
            F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"), lambda x: x != ""
        ).alias("_params"),
    )
    expl = parsed.select(
        "_u",
        "_h",
        "host",
        "_path",
        "_params",
        F.explode("_params").alias("_kv"),
    ).select(
        "_u",
        "_h",
        "host",
        F.substring_index(F.col("_kv"), "=", 1).alias("param"),
        F.concat(
            F.col("host"),
            F.col("_path"),
            F.lit("?"),
            F.array_join(F.array_sort(F.array_remove(F.col("_params"), F.col("_kv"))), "&"),
        ).alias("_base"),
    )
    witness = expl.groupBy("host", "param", "_base").agg(
        F.countDistinct("_u").alias("_nu"),
        F.countDistinct("_h").alias("_nh"),
    )
    return (
        witness.groupBy("host", "param")
        .agg(
            F.sum(
                F.when((F.col("_nu") >= 2) & (F.col("_nh") == 1), 1).otherwise(0)
            ).alias("support"),
            F.sum(F.when(F.col("_nh") > 1, 1).otherwise(0)).alias("contradictions"),
        )
        .withColumn(
            "is_rule",
            (F.col("support") >= F.lit(int(min_support)))
            & (F.col("contradictions") == 0),
        )
    )


def dust_param_dim(rules: DataFrame) -> DataFrame:
    """Collapse :func:`dust_rules` output to the tiny per-host dimension
    (_rhost, _drop:array<string>) that :func:`canonicalize_with_dim`
    broadcasts. Only ``is_rule`` rows participate."""
    return (
        rules.filter(F.col("is_rule"))
        .groupBy(F.col("host").alias("_rhost"))
        .agg(F.collect_set("param").alias("_drop"))
    )


def canonicalize_with_dim(
    urls: DataFrame,
    dim: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    passthrough_unmatched: bool = False,
) -> DataFrame:
    """Canonicalize a URL column against a pre-built
    :func:`dust_param_dim`: drop each host's learned content-irrelevant
    params (sorted survivors, '?' dropped when none survive). The dim is
    broadcast; the URL stream never shuffles.

    ``passthrough_unmatched=True`` (the engine's seen-key mode) rewrites
    ONLY rows whose host has a learned rule; every other URL — including
    unparseable ones — passes through byte-identical, so turning the
    valve on cannot perturb seen keys outside the learned hosts."""
    dim = F.broadcast(dim)
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    out = urls.withColumn("_host", host).join(
        dim, F.col("_host") == F.col("_rhost"), "left"
    )
    params = F.filter(F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"), lambda x: x != "")
    kept = F.array_sort(
        F.filter(
            params,
            lambda kv: ~F.array_contains(
                F.coalesce(F.col("_drop"), F.array().cast("array<string>")),
                F.substring_index(kv, "=", 1),
            ),
        )
    )
    prefix = F.concat(
        F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1),
        F.regexp_extract(url, _PATH_RE, 1),
    )
    canon = F.when(F.size(kept) > 0, F.concat(prefix, F.lit("?"), F.array_join(kept, "&"))).otherwise(
        prefix
    )
    if passthrough_unmatched:
        canon = F.when(F.col("_rhost").isNull() | (F.col("_host") == ""), url).otherwise(canon)
    return out.withColumn(out_col, canon).drop("_host", "_rhost", "_drop")


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Canonicalize URLs with mined rules — :func:`dust_param_dim` +
    :func:`canonicalize_with_dim` in one step."""
    return canonicalize_with_dim(urls, dust_param_dim(rules), url_col, out_col)
