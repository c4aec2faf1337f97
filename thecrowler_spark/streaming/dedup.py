"""Stateful streaming URL-seen dedup (Structured Streaming).

The reference's visited-set is per-source in-memory state probed as
links arrive (/root/reference/pkg/crawler/crawler.go:2223-2228); the
batch engine renders it as an anti-join per round. This module is the
*continuous* rendering: a stream of discovered links deduped on the
normalized URL key with watermark-bounded state —
``dropDuplicatesWithinWatermark`` keeps one state entry per key and
expires it after the watermark (the Events TTL analog,
postgresql-setup.pgsql:877), so state stays bounded at 10^10-URL scale
as long as re-discoveries cluster in time.

The same transform runs on a batch DataFrame (plain dropDuplicates) —
batch output is the oracle for the streaming run
(tests/test_streaming_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thecrowler_spark.functions import urls as U


def dedup_discovered_links(
    links: DataFrame,
    url_col: str = "link",
    ts_col: str = "discovered_at",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per normalized URL.

    Streaming: watermark + ``dropDuplicatesWithinWatermark`` (state
    expires; safe under late data within the watermark). Batch: plain
    ``dropDuplicates`` on the same key — identical first-wins semantics
    for in-order input.
    """
    out = links.withColumn("norm_url", U.normalize_url_seen(url_col))
    if out.isStreaming:
        out = out.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["norm_url"])
    return out.dropDuplicates(["norm_url"])
