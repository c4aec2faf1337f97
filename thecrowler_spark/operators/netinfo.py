"""Screenshot / NetInfo / HTTPInfo metadata sinks (SURVEY §2.1 S9/S10).

The reference stores full-page screenshots (S9: ``insertScreenshot``,
/root/reference/pkg/crawler/web.go:217-307 + Screenshots table) and
whois/DNS/TLS/header JSONB blobs hash-deduped (S10: ``insertNetInfo``,
/root/reference/pkg/crawler/crawler.go:1580-1696). Actual capture is
out of crawl-core scope here (no live network/browser) — these are the
*metadata rows + dedup semantics*: typed schemas, content-hash keys,
idempotent MERGE sinks, so a capture stage can be plugged in front
without touching the sink contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thecrowler_spark.functions.jsonutil import canonical_json
from thecrowler_spark.sources.lake import LakeTable

#: Screenshots row (postgresql-setup.pgsql Screenshots table analog)
SCREENSHOT_SCHEMA = (
    "index_id string, screenshot_ref string, type string, width int, height int, "
    "byte_size long, content_hash string"
)

#: NetInfo / HTTPInfo rows: details JSONB keyed by hash (pgsql NetInfo/HTTPInfo)
NETINFO_SCHEMA = "index_id string, kind string, details string, details_hash string"


def screenshot_rows(pages: DataFrame, ref_prefix: str = "file://screenshots/") -> DataFrame:
    """Metadata row per page for a (stubbed) full-page screenshot; the
    ref is deterministic from the page URL, the content hash keys dedup."""
    idx = F.sha2(F.col("doc_id"), 256)
    return pages.select(
        idx.alias("index_id"),
        F.concat(F.lit(ref_prefix), idx, F.lit(".png")).alias("screenshot_ref"),
        F.lit("full_page").alias("type"),
        F.lit(0).cast("int").alias("width"),
        F.lit(0).cast("int").alias("height"),
        F.lit(0).cast("long").alias("byte_size"),
        F.sha2(F.concat(F.lit("screenshot:"), F.col("doc_id")), 256).alias("content_hash"),
    )


def netinfo_rows(pages: DataFrame, kind: str = "netinfo", details_col: str = "details") -> DataFrame:
    """NetInfo/HTTPInfo rows: canonical-JSON details + sha256 dedup key
    (crawler.go:1587-1590 hashes the JSON to dedup identical blobs)."""
    canon = canonical_json(F.col(details_col))
    return pages.select(
        F.sha2(F.col("doc_id"), 256).alias("index_id"),
        F.lit(kind).alias("kind"),
        canon.alias("details"),
        F.sha2(canon, 256).alias("details_hash"),
    )


def write_netinfo(spark, lake_dir: str, rows: DataFrame) -> int:
    """Hash-deduped idempotent MERGE (one row per distinct blob per page)."""
    lake = LakeTable(spark, f"{lake_dir}/net_info")
    return lake.merge(rows, ["index_id", "kind", "details_hash"])


def write_screenshots(spark, lake_dir: str, rows: DataFrame) -> int:
    lake = LakeTable(spark, f"{lake_dir}/screenshots")
    return lake.merge(rows, ["index_id", "content_hash"])
