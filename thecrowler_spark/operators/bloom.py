"""Partitioned bloom filter for the URL-seen set (custom piece #1,
SURVEY.md §4).

At 10^10 seen-URLs, anti-joining every round's candidates against the
full seen table shuffles terabytes. The bloom prefilter cuts that: the
seen set is summarized into per-bucket bloom blobs (bucket =
``pmod(xxhash64(norm_url), n_buckets)``); candidates that are
**bloom-negative are definitely unseen** and skip the exact join
entirely; only bloom-positives (seen + false positives) go to the exact
``left_anti``. The bloom is never authoritative — final set equality
with the plain anti-join is exact by construction (tested).

Engineering shape:
- key hashing happens JVM-side (``xxhash64`` twice → h1, h2), so the
  Python side touches only int64 arrays — pure vectorized numpy via
  Arrow batches, no per-row Python;
- bloom build is ``applyInPandas`` per bucket (one blob per bucket →
  bounded memory per task regardless of total set size);
- probe is a ``cogroup().applyInPandas`` — each bucket's candidates
  meet exactly their bucket's blob, no blob duplication per row;
- k probes via double hashing: idx_i = (h1 + i·h2) mod m.

Reference analog: ``visitedLinks`` map + ``IsURLKnown`` EXISTS probe
(/root/reference/pkg/crawler/crawler.go:2223-2228,
/root/reference/pkg/database/queries.go:74-88) — correct at one
process's scale, impossible at 10^10; this is the scale-out design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H2_SALT = 0x9E3779B9
BLOOM_SCHEMA = "bucket long, bloom binary, m long, k int, n_keys long"


def _with_hashes(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn("_h1", F.xxhash64(F.col(key_col))).withColumn(
        "_h2", F.xxhash64(F.col(key_col), F.lit(_H2_SALT))
    ).withColumn("_bucket", F.pmod(F.col("_h1"), F.lit(n_buckets)))


def _bit_indices(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) probe positions via double hashing, vectorized."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64) | np.uint64(1)  # odd step → full cycle
    i = np.arange(k, dtype=np.uint64)
    return ((u1[:, None] + i[None, :] * u2[:, None]) % np.uint64(m)).astype(np.int64)


def build_bloom(
    seen: DataFrame,
    key_col: str = "norm_url",
    n_buckets: int = 64,
    bits_per_key: int = 12,
    k: int = 7,
) -> DataFrame:
    """Per-bucket bloom blobs from the seen-key set."""
    hashed = _with_hashes(seen.select(key_col).dropDuplicates(), key_col, n_buckets)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        m = max(64, int(n * bits_per_key))
        m = (m + 7) // 8 * 8
        arr = np.zeros(m // 8, dtype=np.uint8)
        idx = _bit_indices(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, m)
        flat = idx.ravel()
        np.bitwise_or.at(arr, flat >> 3, (1 << (flat & 7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["_bucket"].iloc[0])],
                "bloom": [arr.tobytes()],
                "m": [m],
                "k": [k],
                "n_keys": [n],
            }
        )

    return hashed.groupBy("_bucket").applyInPandas(per_bucket, BLOOM_SCHEMA)


def probe_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "norm_url",
    n_buckets: int = 64,
) -> DataFrame:
    """Adds ``bloom_maybe`` (False ⇒ DEFINITELY unseen)."""
    cand = _with_hashes(candidates, key_col, n_buckets)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", bloom_maybe boolean"

    def per_bucket(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        res = cand_pdf.drop(columns=["_h1", "_h2", "_bucket"])
        if len(bloom_pdf) == 0 or len(cand_pdf) == 0:
            res["bloom_maybe"] = False if len(cand_pdf) else pd.Series([], dtype=bool)
            return res
        arr = np.frombuffer(bloom_pdf["bloom"].iloc[0], dtype=np.uint8)
        m = int(bloom_pdf["m"].iloc[0])
        k = int(bloom_pdf["k"].iloc[0])
        idx = _bit_indices(cand_pdf["_h1"].to_numpy(), cand_pdf["_h2"].to_numpy(), k, m)
        bits = (arr[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        res["bloom_maybe"] = bits.all(axis=1).astype(bool)
        return res

    return (
        cand.groupBy("_bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(per_bucket, out_schema)
    )


def exact_after_prefilter(
    probed: DataFrame, seen: DataFrame, key_col: str, flag_col: str
) -> DataFrame:
    """Shared prefilter→exact scaffold (bloom and cuckoo siblings):
    flag False ⇒ definitely unseen, bypasses the join; flag True gets
    the authoritative left_anti so false positives never drop a URL."""
    negatives = probed.filter(~F.col(flag_col)).drop(flag_col)
    positives = probed.filter(F.col(flag_col)).drop(flag_col)
    checked = positives.join(seen.select(key_col).dropDuplicates(), [key_col], "left_anti")
    return negatives.unionByName(checked)


def dedup_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    key_col: str = "norm_url",
    n_buckets: int = 64,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """candidates ∖ seen, bloom-accelerated; result set ≡ plain left_anti.

    Negatives bypass the shuffle-heavy exact join (at steady-state crawl
    most discovered links are NEW, so most rows take the cheap path);
    positives get the exact check so false positives never drop a URL.
    """
    if bloom is None:
        bloom = build_bloom(seen, key_col, n_buckets)
    probed = probe_bloom(candidates, bloom, key_col, n_buckets)
    return exact_after_prefilter(probed, seen, key_col, "bloom_maybe")
