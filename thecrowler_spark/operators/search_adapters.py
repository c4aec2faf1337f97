"""Web search-provider JSON adapters, set-at-a-time.

Re-expresses the infoseed JSON search providers
(/root/reference/pkg/infoseed/searchproviders/searchproviders.go) over
a DataFrame of already-fetched response bodies instead of live HTTP —
the VariantType sibling of operators/cdx.py:

- ``generic`` ← ``parseResults`` + ``findResultItems`` +
  ``resultFromValue`` (:684-703, :775-823): item discovery through the
  results/items/webPages.value/organic_results key chain, array root,
  or the singleton-map fallback; items may be plain URL strings or
  objects (url/link/href/displayUrl key chain, strict-string like Go's
  type assert — a numeric item never becomes a URL); title = first of
  title/name; snippet = first of snippet/description/summary; score =
  the item's own numeric ``score`` when present else 0 (the generic
  parser never assigns reciprocal rank).
- ``brave_search`` ← ``parseBraveResults`` (:705-738):
  ``$.web.results`` REQUIRED (missing/invalid → the whole page is
  malformed, as is any non-object item); description→snippet key
  order; score = 1/rank.
- ``bing_web_search`` ← ``parseBingResults`` (:740-773):
  ``$.webPages.value`` required; name→title, snippet→description;
  score = 1/rank.
- Shared Go contract corners: rank = the ITEM index + 1, so blank-url
  items CONSUME ranks (unlike the CDX provider, which re-ranks);
  ``boundedOptions`` clamps and the page_size×max_pages
  ``trimResults`` budget over the (page, item) fetch order with NO
  global re-rank (Search :159-178 appends per-page results verbatim);
  ``MaxRequests`` page-prefix budget.

Malformed pages keep their classification and contribute no rows (the
Go providers abort the whole search; set-at-a-time the page is
auditable — the same rejected-rows contract as feeds/cdx).

Engine shape: bodies parse once to VariantType (``try_parse_json``)
and every extraction is ``try_variant_get`` / higher-order-function
column expressions — JVM-side, no Python UDF, pages embarrassingly
parallel; the budget trim is a TakeOrdered over ≤1000 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .feeds import _bounded

#: findResultItems key chain (searchproviders.go:780)
GENERIC_ITEM_PATHS = ("$.results", "$.items", "$.webPages.value", "$.organic_results")
#: resultFromValue URL key chain (:814)
GENERIC_URL_KEYS = ("url", "link", "href", "displayUrl")

_PROVIDERS = {
    "brave_search": {
        "items": "$.web.results",
        "url": ("url",),
        "title": ("title",),
        "snippet": ("description", "snippet"),
    },
    "bing_web_search": {
        "items": "$.webPages.value",
        "url": ("url",),
        "title": ("name", "title"),
        "snippet": ("snippet", "description"),
    },
}


def _vstr(it: Column, key: str) -> Column:
    """``firstString`` one key: JSON string values only (a number or
    bool type-asserts to '' in Go) — guarded by the variant's schema."""
    return F.when(
        F.schema_of_variant(F.try_variant_get(it, f"$.{key}", "variant")) == "STRING",
        F.try_variant_get(it, f"$.{key}", "string"),
    )


def _first_str(it: Column, keys: tuple[str, ...]) -> Column:
    return F.coalesce(*[_vstr(it, k) for k in keys], F.lit(""))


def _generic_items(v: Column) -> Column:
    arr = F.coalesce(
        *[F.try_variant_get(v, p, "array<variant>") for p in GENERIC_ITEM_PATHS],
        F.try_variant_get(v, "$", "array<variant>"),
    )
    obj_root = F.try_variant_get(v, "$", "map<string,variant>")
    return F.when(arr.isNotNull(), arr).when(obj_root.isNotNull(), F.array(v))


def classify_search(
    df: DataFrame, provider: str = "generic",
    body_col: str = "body", out_col: str = "search_kind",
) -> DataFrame:
    """Append the page class: ok | blank | malformed."""
    b = F.trim(F.col(body_col))
    v = F.try_parse_json(F.col(body_col))
    bad = v.isNull()
    if provider != "generic":
        cfg = _PROVIDERS[provider]
        items = F.try_variant_get(v, cfg["items"], "array<variant>")
        # missing/invalid section, or any non-object item, aborts (Go
        # :712-718, :724-727 and the bing twins)
        bad = bad | items.isNull() | F.exists(
            items,
            lambda it: F.try_variant_get(it, "$", "map<string,variant>").isNull(),
        )
    return df.withColumn(
        out_col,
        F.when(b == "", F.lit("blank"))
        .when(bad, F.lit("malformed"))
        .otherwise(F.lit("ok")),
    )


def parse_search_results(
    pages: DataFrame,
    provider: str = "generic",
    page_size: int = 10,
    max_pages: int = 1,
    max_requests: int = 0,
    order_col: str = "page_order",
    body_col: str = "body",
) -> DataFrame:
    """Parse + budget-trim fetched provider pages.

    Output: (page_order, rank, score, url, title, snippet) — ranks are
    per-page item indices (blank-url items consume them), the trim is
    the concatenated fetch-order prefix, faithful to Search().
    """
    limit, _ = _bounded(page_size, max_pages, max_requests)
    base = classify_search(pages, provider=provider, body_col=body_col)
    if max_requests > 0:
        base = base.where(F.col(order_col) < max_requests)
    v = F.try_parse_json(F.col(body_col))
    if provider == "generic":
        items = _generic_items(v)
    else:
        items = F.try_variant_get(v, _PROVIDERS[provider]["items"], "array<variant>")
    items = F.when(F.col("search_kind") == "ok", items)
    ex = base.select(
        F.col(order_col).alias("_ord"), F.posexplode(items).alias("_pos", "_it")
    )
    it = F.col("_it")
    if provider == "generic":
        is_str = F.schema_of_variant(it) == "STRING"

        def url_key(k: str) -> Column:
            # string-typed AND non-blank, else fall through (:814-818)
            s = _vstr(it, k)
            return F.when(F.trim(F.coalesce(s, F.lit(""))) != "", s)

        url = F.when(is_str, F.try_variant_get(it, "$", "string")).otherwise(
            F.coalesce(*[url_key(k) for k in GENERIC_URL_KEYS], F.lit(""))
        )
        title = _first_str(it, ("title", "name"))
        snippet = _first_str(it, ("snippet", "description", "summary"))
        score = F.coalesce(
            F.try_variant_get(it, "$.score", "double"), F.lit(0.0)
        )
    else:
        cfg = _PROVIDERS[provider]
        url = _first_str(it, cfg["url"])
        title = _first_str(it, cfg["title"])
        snippet = _first_str(it, cfg["snippet"])
        score = F.lit(1.0) / (F.col("_pos") + 1)
    out = (
        ex.select(
            "_ord", "_pos",
            (F.col("_pos") + 1).cast("int").alias("rank"),
            score.alias("score"), url.alias("url"),
            title.alias("title"), snippet.alias("snippet"),
        )
        .where(F.trim(F.col("url")) != "")
        .orderBy("_ord", "_pos")
        .limit(limit)
    )
    return out.select(
        F.col("_ord").alias("page_order"), "rank", "score", "url", "title", "snippet"
    )
