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


def correlated_sources_by_domain(
    domain: str,
    source_search_index: DataFrame,
    sources: DataFrame,
    netinfo: DataFrame | None = None,
    netinfo_index: DataFrame | None = None,
    httpinfo: DataFrame | None = None,
    httpinfo_index: DataFrame | None = None,
    web_objects: DataFrame | None = None,
    web_objects_index: DataFrame | None = None,
) -> DataFrame:
    """``find_correlated_sources_by_domain``
    (/root/reference/pkg/database/postgresql-setup.pgsql:2907-2947):
    sources whose NetInfo / HTTPInfo / WebObjects ``details`` blobs
    mention the domain — three probe CTEs UNION-distinct, joined back
    to Sources; output (source_id, source_uid, url), COALESCE'd uid.

    Scale shape: each probe is a pushed-down LIKE filter + two
    equi-joins; the union dedups on source_id (one shuffle); the final
    Sources join is an equi-join. Nothing is quadratic in sources.
    """
    like = f"%{domain}%"

    def probe(detail_df, bridge, key):
        hits = detail_df.filter(F.col("details").cast("string").like(like)).select(key)
        return hits.join(bridge, key).join(
            source_search_index.select("index_id", "source_id"), "index_id"
        ).select("source_id")

    probes = []
    if netinfo is not None and netinfo_index is not None:
        probes.append(probe(netinfo, netinfo_index, "netinfo_id"))
    if httpinfo is not None and httpinfo_index is not None:
        probes.append(probe(httpinfo, httpinfo_index, "httpinfo_id"))
    if web_objects is not None and web_objects_index is not None:
        probes.append(probe(web_objects, web_objects_index, "object_id"))
    if not probes:
        raise ValueError("at least one (details, bridge) pair required")
    all_partners = probes[0]
    for p in probes[1:]:
        all_partners = all_partners.unionByName(p)
    all_partners = all_partners.distinct()
    return (
        sources.join(all_partners, "source_id")
        .select(
            "source_id",
            F.coalesce(F.col("source_uid"), F.lit("")).alias("source_uid"),
            "url",
        )
        .distinct()
    )


def correlated_sites_report(
    partners: DataFrame,
    source_search_index: DataFrame,
    netinfo: DataFrame | None = None,
    netinfo_index: DataFrame | None = None,
    httpinfo: DataFrame | None = None,
    httpinfo_index: DataFrame | None = None,
) -> DataFrame:
    """``sqlCorrelatedSitesBody`` (sql_templates.go:203-242): partner
    sources joined to their whois (NetInfo) and ssl (HTTPInfo) details,
    keeping rows where either exists. Documented divergence: scalar
    leaves (``whois_registrant``, ``ssl_issuer``) instead of raw JSON
    sub-objects — JSON re-serialization (spacing/key order) differs
    across engines, scalars don't.
    """
    df = partners.join(source_search_index.select("index_id", "source_id"), "source_id")
    whois = F.lit(None).cast("string")
    ssl = F.lit(None).cast("string")
    if netinfo is not None and netinfo_index is not None:
        ni = netinfo_index.join(netinfo, "netinfo_id").select(
            "index_id", F.get_json_object("details", "$.whois.registrant").alias("_whois")
        )
        df = df.join(ni, "index_id", "left")
        whois = F.col("_whois")
    if httpinfo is not None and httpinfo_index is not None:
        hi = httpinfo_index.join(httpinfo, "httpinfo_id").select(
            "index_id", F.get_json_object("details", "$.ssl_info.issuer").alias("_ssl")
        )
        df = df.join(hi, "index_id", "left")
        ssl = F.col("_ssl")
    return (
        df.filter(whois.isNotNull() | ssl.isNotNull())
        .select(
            "source_id",
            F.coalesce(F.col("source_uid"), F.lit("")).alias("source_uid"),
            "url",
            whois.alias("whois_registrant"),
            ssl.alias("ssl_issuer"),
        )
        .distinct()
    )
