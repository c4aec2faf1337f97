"""URL-level corpus quality filtering (RefinedWeb-style, UT1-shaped).

Large-scale pretraining pipelines filter crawl URLs BEFORE fetching or
keeping their documents: a blocklist of known-bad domains (the UT1 /
Blacklists-UT-Capitole pattern: millions of adult/gambling/malware
domains) plus a soft score over the words that appear in the URL
itself (RefinedWeb §G.1: weighted word matches against the lowercased
URL, with strict substring fragments that block outright).  The
reference crawler's own skip machinery is pattern-based
(/root/reference/pkg/crawler/crawler.go:2295-2368 restriction levels +
unwanted-URL regexes); this operator is the curation-side complement
that grades a *candidate corpus* rather than a live frontier.

Scale design (10^10 URLs, multi-million-entry blocklist):

- the blocklist arrives as a DataFrame and is **broadcast** into a
  left join on the exact hostname — no shuffle of the URL stream, and
  a 4M-domain UT1 list is ~100 MB, comfortably broadcastable;
- word scoring is a pure JVM expression chain (``split`` on
  non-alphanumerics → ``transform`` through a literal weight map →
  ``aggregate`` sum) — zero Python, zero shuffle, whole-stage codegen;
- strict fragments are ``contains`` predicates over the lowercased
  URL — likewise codegen'd.

The weight table here is a deterministic synthetic stand-in for the
RefinedWeb word lists (which are not redistributable); swap the map
literal / fragment tuple for the real lists at deploy time.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, functions as F

from thecrowler_spark.functions import urls as U

# Soft word weights: every word of the URL (split on non-alphanumerics,
# lowercased) contributes its weight; the sum is the URL's spam score.
URL_WORD_WEIGHTS: dict[str, float] = {
    "poker": 2.0,
    "bet": 1.5,
    "adult": 2.5,
    "pills": 1.5,
    "viagra": 2.5,
    "torrent": 1.0,
    "crack": 1.0,
    "free": 0.5,
    "win": 0.5,
    "download": 0.5,
}

# Strict fragments: a substring hit anywhere in the lowercased URL
# blocks outright (UT1 "strict" category).
URL_BLOCK_FRAGMENTS: tuple[str, ...] = ("casino", "xxx", "warez")

DEFAULT_THRESHOLD = 2.0


def url_word_score(url: Column | str) -> Column:
    """Soft spam score: sum of URL_WORD_WEIGHTS over the URL's words.

    Pure Column expression — split / transform / aggregate, all JVM.
    """
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    weight_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(URL_WORD_WEIGHTS.items())]
    )
    words = F.filter(F.split(u, "[^a-z0-9]+"), lambda w: w != "")
    return F.aggregate(
        F.transform(words, lambda w: F.coalesce(weight_map[w], F.lit(0.0))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def url_fragment_hit(url: Column | str) -> Column:
    """True if any strict fragment appears anywhere in the URL."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    hit = F.lit(False)
    for frag in URL_BLOCK_FRAGMENTS:
        hit = hit | u.contains(frag)
    return hit


def url_quality_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Annotate every URL with its filter verdict.

    ``blocklist`` must have a single ``host`` string column (exact
    hostnames).  Adds:

    - ``host``           — parsed hostname (JVM regexp);
    - ``blocked_domain`` — hostname is on the blocklist (broadcast
      left-join; null-safe);
    - ``word_score``     — soft weighted word score;
    - ``frag_hit``       — strict fragment match;
    - ``kept``           — survives all three tests.

    One broadcast join, no shuffle of the URL stream.
    """
    hosts = blocklist.select(F.col("host").alias("__bl_host")).distinct()
    out = (
        df.withColumn("host", U.url_hostname(url_col))
        .join(F.broadcast(hosts), F.col("host") == F.col("__bl_host"), "left")
        .withColumn("blocked_domain", F.col("__bl_host").isNotNull())
        .drop("__bl_host")
        .withColumn("word_score", url_word_score(url_col))
        .withColumn("frag_hit", url_fragment_hit(url_col))
    )
    return out.withColumn(
        "kept",
        ~F.col("blocked_domain")
        & ~F.col("frag_hit")
        & (F.col("word_score") < F.lit(float(threshold))),
    )
