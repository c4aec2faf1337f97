"""Common Crawl CDX index ingestion, set-at-a-time.

Re-expresses the infoseed ``common_crawl_index`` search provider
(/root/reference/pkg/infoseed/searchproviders/common_crawl_index.go)
over a DataFrame of already-fetched index pages instead of live HTTP:

- :func:`classify_cdx` ← ``parseCommonCrawlIndexResults`` (:225-255)
  body dispatch: ``json`` (array form) / ``ndjson`` / ``blank`` (empty
  body → no items, no error, :227-229) / ``malformed`` (the Go
  provider aborts the whole search with "malformed common_crawl_index
  response"; set-at-a-time the page keeps its kind so callers can
  audit the exclusion — the same rejected-rows contract as
  operators/feeds.py and operators/candidates.py).
- :func:`cdx_records` ← ``commonCrawlResultsFromItems`` (:257-273):
  per-record field projection (url/timestamp/mime/status/digest/
  urlkey/filename via ``firstString`` — missing key → ''), blank-url
  records skipped WITHOUT consuming a rank (:260-263), capture title
  fallback (``commonCrawlTitle`` :295-300). UNTRIMMED — this is the
  10^10-row ingestion path a frontier seeds from.
- :func:`parse_cdx_records` ← ``Search`` (:49-82): cdx_records +
  ``rankCommonCrawlResults`` global re-rank (:275-282, rank = global
  (endpoint, page, line) order, ``reciprocalRank`` 1/rank score) +
  ``boundedOptions`` clamps and the page_size×max_pages
  ``trimResults`` budget, ``MaxRequests`` page prefix (:55-60).
- :func:`render_cdx_query` / :func:`looks_like_domain` /
  :func:`build_cdx_filters` / :func:`split_cdx_list` ← the driver-side
  request-building string logic (``renderCommonCrawlIndexQuery``
  :167-200, ``applyCommonCrawlIndexFilters`` :202-223,
  ``splitCommonCrawlIndexList`` :123-139) — plan-time Python, unit
  tested against the Go test's own assertions
  (searchproviders_test.go:494-533).

Beyond the reference (the scale path a 100 TB training pipeline
needs — the reference fetches CDX pages one HTTP GET at a time; we
treat the full Common Crawl index, ~10^10 capture records per crawl,
as a table):

- :func:`surt_key` — SURT (Sort-friendly URI Reordering Transform)
  urlkey computed locally as pure JVM column expressions, so records
  from CDX servers that omit ``urlkey`` (or URL lists that never saw a
  CDX server) still get the canonical grouping key the index sorts by.
- :func:`latest_captures` — newest capture per urlkey as ONE
  partial-agg ``max(struct(timestamp, digest, ...))`` groupBy (CDX
  timestamps are fixed-width yyyymmddhhmmss strings, so string max =
  newest; digest next = deterministic tie-break). No window, no sort:
  a urlkey with 10^6 captures collapses map-side.

Engine-shape notes (100 TB stance): pages are independent rows and
every parse step is ``from_json`` / ``split`` / ``filter`` column
expressions — JVM-side, whole-stage-codegen'd, no Python UDF. The
global rank is a distributed top-k (``orderBy().limit()`` =
TakeOrdered over the ≤1000-row bounded budget) followed by the
repo-standard two-phase global_row_number — no full-sort shuffle.

Documented divergences from the Go provider:

- The Go pagination loop stops an endpoint after an empty page and
  re-checks the request budget before each fetch; set-at-a-time the
  input IS the fetched page set, so ``max_requests`` keeps the first
  N pages by fetch order and empty pages simply contribute 0 rows.
- ``firstString`` type-asserts JSON *strings*: a numeric ``"status":
  200`` yields '' in Go but "200" here (Spark's from_json coerces
  scalars); fixtures follow the reference's all-string records.
- SURT subset: userinfo is not stripped, %-escapes are not
  normalized, and path dot-segments are kept (the full Java/OpenWayback
  canonicalizer handles those); host-reversal, scheme/fragment drop,
  lowercasing, leading-``www.`` strip, default-port drop and query
  sorting — the parts that decide grouping — are implemented.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .feeds import _bounded
from .ranking import global_row_number

#: record field order fixed by commonCrawlResultsFromItems (:260-270)
CDX_FIELDS = ("url", "timestamp", "mime", "status", "digest", "urlkey", "filename")
_CDX_STRUCT = ", ".join(f"{f} string" for f in CDX_FIELDS)
_CDX_ARRAY = f"array<struct<{_CDX_STRUCT}>>"

#: parameter keys excluded from passthrough (common_crawl_index.go:158)
RESERVED_PARAMS = frozenset({
    "index_endpoint", "index_endpoints", "endpoint", "endpoints", "index",
    "indexes", "url_template", "domain_template", "query_template", "filter",
    "mime", "mime_type", "mime_types", "http_status", "http_statuses",
    "status", "statuses",
})


# ------------------------------------------------------------ driver-side
# request-building string logic (plan-time Python, no row data involved)

def split_cdx_list(value: str | None) -> list[str]:
    """``splitCommonCrawlIndexList`` :123-139 — split on , \\n \\r \\t,
    trim, drop empties."""
    if not value:
        return []
    return [t for t in (f.strip() for f in re.split(r"[,\n\r\t]", value)) if t]


def looks_like_domain(query: str) -> bool:
    """``commonCrawlLooksLikeDomain`` :188-193."""
    if "://" in query or any(c in query for c in "/*?"):
        return False
    return "." in query and not any(c in query for c in " \t\n\r")


def _query_domain(query: str) -> str:
    """``commonCrawlQueryDomain`` :195-200 (url.Parse host wins; a bare
    domain has no scheme so Go's parse yields Host='' → trim branch)."""
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", query)
    if m and m.group(1):
        return m.group(1)
    return query.strip(" /")


def render_cdx_query(query: str, parameters: dict[str, str] | None = None) -> str:
    """``renderCommonCrawlIndexQuery`` :167-186 — template selection
    (query_template > domain/url template by shape) + placeholder fill."""
    parameters = parameters or {}
    trimmed = query.strip()
    template = parameters.get("query_template", "").strip()
    if not template:
        if looks_like_domain(trimmed):
            template = parameters.get("domain_template", "").strip() or "{domain}/*"
        else:
            template = parameters.get("url_template", "").strip() or "{url}"
    domain = _query_domain(trimmed)
    return (
        template.replace("{query}", trimmed)
        .replace("{url}", trimmed)
        .replace("{domain}", domain)
    )


def build_cdx_filters(parameters: dict[str, str] | None = None) -> list[str]:
    """``applyCommonCrawlIndexFilters`` :202-223 — explicit filter list,
    then mime:* keys, then status:* keys, blanks dropped, order kept."""
    parameters = parameters or {}
    filters = list(split_cdx_list(parameters.get("filter")))
    for key in ("mime", "mime_type", "mime_types"):
        filters += [f"mime:{v}" for v in split_cdx_list(parameters.get(key))]
    for key in ("http_status", "http_statuses", "status", "statuses"):
        filters += [f"status:{v}" for v in split_cdx_list(parameters.get(key))]
    return [f for f in filters if f.strip()]


# --------------------------------------------------------------- set-at-a-time

def _nd_lines(body_col: str) -> Column:
    return F.filter(
        F.transform(F.split(F.col(body_col), "\n"), F.trim), lambda l: l != ""
    )


def classify_cdx(
    df: DataFrame, body_col: str = "body", out_col: str = "cdx_kind"
) -> DataFrame:
    """Append the body-dispatch class: json | ndjson | blank | malformed."""
    b = F.trim(F.col(body_col))
    # PERMISSIVE from_json yields an all-null struct (not NULL) on a corrupt
    # line, so bad-line detection goes through the corrupt-record column.
    nd_bad = F.exists(
        _nd_lines(body_col),
        lambda l: F.from_json(
            l, _CDX_STRUCT + ", _corrupt string",
            {"columnNameOfCorruptRecord": "_corrupt"},
        )["_corrupt"].isNotNull(),
    )
    return df.withColumn(
        out_col,
        F.when(b == "", F.lit("blank"))
        .when(
            b.startswith("["),
            F.when(F.from_json(b, _CDX_ARRAY).isNull(), F.lit("malformed"))
            .otherwise(F.lit("json")),
        )
        .otherwise(F.when(nd_bad, F.lit("malformed")).otherwise(F.lit("ndjson"))),
    )


def cdx_records(
    pages: DataFrame,
    max_requests: int = 0,
    order_col: str = "page_order",
    index_col: str = "index_name",
    body_col: str = "body",
) -> DataFrame:
    """Explode fetched CDX index pages into capture records — UNTRIMMED.

    ``order_col`` is the global fetch order ((endpoint, page) loop
    index); blank-url records are skipped without consuming a position.
    Output: (_ord, _pos, index_name, url, title, digest, timestamp,
    mime, status, urlkey, filename), one row per kept record.
    """
    base = classify_cdx(pages, body_col=body_col)
    if max_requests > 0:
        base = base.where(F.col(order_col) < max_requests)
    recs = (
        F.when(F.col("cdx_kind") == "json", F.from_json(F.trim(F.col(body_col)), _CDX_ARRAY))
        .when(
            F.col("cdx_kind") == "ndjson",
            F.transform(_nd_lines(body_col), lambda l: F.from_json(l, _CDX_STRUCT)),
        )
        .otherwise(F.lit(None).cast(_CDX_ARRAY))
    )
    items = base.select(
        F.col(order_col).alias("_ord"),
        F.col(index_col).alias("index_name"),
        F.posexplode(recs).alias("_pos", "_r"),
    )
    r = F.col("_r")
    fields = {f: F.coalesce(r[f], F.lit("")) for f in CDX_FIELDS}
    ts = fields["timestamp"]
    title = F.when(F.trim(ts) == "", F.lit("Common Crawl capture")).otherwise(
        F.concat(F.lit("Common Crawl capture "), ts)
    )
    return items.select(
        "_ord", "_pos", "index_name",
        F.trim(fields["url"]).alias("url"), title.alias("title"),
        fields["digest"].alias("digest"), ts.alias("timestamp"),
        fields["mime"].alias("mime"), fields["status"].alias("status"),
        fields["urlkey"].alias("urlkey"), fields["filename"].alias("filename"),
    ).where(F.col("url") != "")


def parse_cdx_records(
    pages: DataFrame,
    page_size: int = 10,
    max_pages: int = 1,
    max_requests: int = 0,
    order_col: str = "page_order",
    index_col: str = "index_name",
    body_col: str = "body",
) -> DataFrame:
    """cdx_records + the provider's global re-rank and result budget.

    Output: (index_name, rank, score, url, title, digest, timestamp,
    mime, status, urlkey, filename) — the Search() Result shape with
    the metadata map flattened to typed columns.
    """
    limit, _ = _bounded(page_size, max_pages, max_requests)
    kept = cdx_records(
        pages, max_requests=max_requests, order_col=order_col,
        index_col=index_col, body_col=body_col,
    )
    topk = kept.orderBy("_ord", "_pos").limit(limit)
    ranked = global_row_number(
        topk, [F.col("_ord"), F.col("_pos")], out_col="rank", materialize=False
    )
    return ranked.select(
        "index_name",
        F.col("rank").cast("int").alias("rank"),
        (F.lit(1.0) / F.col("rank")).alias("score"),
        "url", "title", "digest", "timestamp", "mime", "status", "urlkey",
        "filename",
    )


# ----------------------------------------------------------- the scale path

def surt_key(url: Column | str) -> Column:
    """SURT urlkey as pure JVM expressions (subset, see module doc):
    lowercase → drop scheme + fragment → reversed comma-joined host
    labels (leading ``www.`` stripped, default :80/:443 dropped, other
    ports kept) → ')' → path, with query params sorted.

    ``https://WWW.Example.com:443/A/b?b=2&a=1`` → ``com,example)/a/b?a=1&b=2``
    """
    u = F.lower(F.trim(url if isinstance(url, Column) else F.col(url)))
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # path+query = everything after hostport ('' when absent → '/')
    tail = F.substring(rest, F.length(hostport) + 1, F.lit(2**30))
    host = F.split_part(hostport, F.lit(":"), F.lit(1))
    port = F.split_part(hostport, F.lit(":"), F.lit(-1))
    port = F.when((port == host) | port.isin("80", "443"), F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.split_part(tail, F.lit("?"), F.lit(1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        tail.contains("?"),
        F.concat(
            F.lit("?"),
            F.array_join(
                F.array_sort(F.split(F.split_part(tail, F.lit("?"), F.lit(-1)), "&")),
                "&",
            ),
        ),
    ).otherwise(F.lit(""))
    return F.concat(rev, port, F.lit(")"), path, query)


def latest_captures(
    records: DataFrame, key_col: str = "urlkey", ts_col: str = "timestamp"
) -> DataFrame:
    """Newest capture per urlkey — ONE partial-agg groupBy, no window.

    ``max(struct(timestamp, digest, <rest>))``: CDX timestamps are
    fixed-width digit strings so string max = newest; the
    content digest is the deterministic tie-break (re-fetches in the
    same second). Column order of the input is preserved.
    """
    rest = [c for c in records.columns if c not in (key_col, ts_col, "digest")]
    pick = F.max(
        F.struct(F.col(ts_col), F.col("digest"), *[F.col(c) for c in rest])
    ).alias("_best")
    out = records.groupBy(key_col).agg(pick)
    return out.select(
        key_col,
        *[F.col(f"_best.{c}") for c in records.columns if c != key_col],
    )
