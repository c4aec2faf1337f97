"""Pure-Python oracle: reference crawl semantics transcribed from the Go.

This is an INDEPENDENT re-implementation (no imports from
thecrowler_spark) of the per-source BFS loop at workers=1 — the
canonical deterministic mode (SURVEY.md §7 trap 1). Every rule cites
the reference line it transcribes. Parity tests compare the Spark
engine's crawl order / URL-seen set / counters against this.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

WEB_SCHEME_PREFIXES = ("http://", "https://", "ftp://", "ftps://")  # protocol.go:33


def normalize_url_seen(url: str) -> str:
    """NormalizeURL — /root/reference/pkg/common/url.go:24-32."""
    return url.strip().rstrip("/").lower()


def normalize_link(url: str) -> str:
    """normalizeURL(url, 0) — crawler.go:2104-2114 (no lowercase)."""
    return url.strip().rstrip("/")


def is_valid_url(u: str) -> bool:
    """IsValidURL — crawler.go:2016-2041 (+ protocol.go:33-50)."""
    t = u.strip()
    if t == "":
        return False
    with_scheme = t if "://" in t else "http://" + t
    if not any(with_scheme.startswith(p) for p in WEB_SCHEME_PREFIXES):
        return False
    if with_scheme.endswith("://"):
        return False
    if re.search(r"\s", t):
        return False
    return True


def scheme_host(url: str) -> str:
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)", url.strip())
    return m.group(1) if m else ""


def combine_urls(base: str, link: str) -> str:
    """combineURLs — crawler.go:2433-2447."""
    if link.startswith("/"):
        return scheme_host(base) + link
    return link


def hostname(url: str) -> str:
    m = re.match(r"^(?:[^/]*://)?(?:[^/@]*@)?([^/:?#]*)", url.strip())
    return m.group(1) if m else ""


def domain_parts(host: str, level: int) -> str:
    """getDomainParts — crawler.go:2175-2187."""
    parts = host.split(".")
    if level == 2 and len(parts) >= 2:
        return ".".join(parts[-2:])
    if level == 3 and len(parts) >= 1:
        return parts[-1]
    return host


def is_external_link(source_url: str, link_url: str, level: int) -> bool:
    """isExternalLink — crawler.go:2131-2172."""
    if level == 4:
        return False
    link_url = link_url.strip()
    if link_url.startswith("/"):
        return False
    src = source_url.strip()
    if level == 0:
        return src != link_url
    if level == 1:
        return not link_url.startswith(src)
    return domain_parts(hostname(src), level) != domain_parts(hostname(link_url), level)


def url_path(url: str) -> str:
    p = re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", "", url)
    return p if p else "/"


@dataclass
class OracleConfig:
    max_depth: int = 2
    max_links: int = 0
    prevent_duplicate_urls: bool = False
    check_robots: bool = False
    unwanted_patterns: tuple[str, ...] = ()
    user_url_patterns: tuple[str, ...] = ()
    max_rounds: int = 50


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, int, int, str]] = field(default_factory=list)  # (source_id, seq, depth, url)
    visited: set[tuple[int, str]] = field(default_factory=set)
    counters: dict[int, dict[str, int]] = field(default_factory=dict)


def extract_links(spans: list[dict]) -> list[str]:
    """Reference link extraction (crawler.go:2062-2074) over spans."""
    out = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] != "link":
            continue
        link = normalize_link(s["media_ref"])
        if link != "" and is_valid_url(link):
            out.append(link)
    return out


def robots_blocked(robots: list[dict], url: str) -> bool:
    """RFC 9309 longest-prefix match; tie → allow; no rule → allow."""
    host = hostname(url)
    path = url_path(url)
    best_len, best_type = -1, None
    for r in robots:
        if r["host"] != host or not path.startswith(r["path_prefix"]):
            continue
        plen = len(r["path_prefix"])
        if plen > best_len or (plen == best_len and r["rule_type"] == "allow"):
            best_len, best_type = plen, r["rule_type"]
    return best_type == "disallow"


def crawl_source(
    docs: dict[str, list[dict]],
    source_id: int,
    source_url: str,
    restricted: int,
    cfg: OracleConfig,
    robots: list[dict] | None = None,
    global_known: set[str] | None = None,
    alternative_links: list[str] | None = None,
) -> OracleResult:
    """One source's crawl at workers=1 — CrawlWebsite crawler.go:81-539."""
    res = OracleResult()
    c = res.counters.setdefault(
        source_id, dict(pages=0, links=0, skipped=0, duplicates=0, errors=0)
    )
    visited: set[str] = set()
    global_known = global_known if global_known is not None else set()
    robots = robots or []

    def skip_url(url: str) -> bool:
        """skipURLWithExternalApproval — crawler.go:2295-2368."""
        url = url.strip()
        if url == "":
            return True
        if url.startswith("/"):
            url = combine_urls(source_url, url)
        if restricted != 4 and is_external_link(source_url, url, restricted):
            return True
        for pat in cfg.unwanted_patterns:
            if re.search(pat, url):
                return True
        if url == source_url:
            return True
        if cfg.user_url_patterns:
            matches = 0
            should_skip = False
            for pat in cfg.user_url_patterns:
                neg = pat.startswith("!")
                body = pat[1:] if neg else pat
                if re.search(body, url):
                    matches += 1
                    should_skip = neg
                    break
            if should_skip or matches == 0:
                return True
        if cfg.check_robots and robots_blocked(robots, url):
            return True
        return False

    # ---- CrawlInitialURL (web.go:912-993) ----
    if source_url not in docs:
        return res  # seed fetch error → source error state, nothing crawled
    res.crawl_order.append((source_id, 0, 0, source_url))
    visited.add(normalize_url_seen(source_url))
    c["pages"] += 1
    all_links = extract_links(docs[source_url])
    # alternative_links from source config appended if not already
    # present (exact string match, config order) — crawler.go:318-353;
    # TotalLinks counts AFTER the append (crawler.go:412)
    for alt in alternative_links or []:
        if alt not in all_links:
            all_links.append(alt)
    c["links"] += len(all_links)

    if restricted == 0:
        res.visited = {(source_id, v) for v in visited}
        return res  # no BFS loop (crawler.go:414)

    max_depth = 1 if cfg.max_depth == 0 else cfg.max_depth
    current_depth = 0
    fetch_seq = 1
    rounds = 0

    while current_depth < max_depth and all_links and rounds < cfg.max_rounds:
        rounds += 1
        new_links: list[str] = []
        skipped: list[str] = []
        stopped = False
        for link in all_links:
            # worker loop — crawler.go:2198-2289
            if cfg.max_links > 0 and c["pages"] >= cfg.max_links:
                stopped = True
                break
            url_link = combine_urls(source_url, link) if link.startswith("/") else link
            if skip_url(url_link):
                c["skipped"] += 1
                skipped.append(link)
                continue
            if normalize_url_seen(url_link) in visited:
                c["duplicates"] += 1
                continue
            if cfg.prevent_duplicate_urls and normalize_url_seen(url_link) in global_known:
                continue
            # processJob: fetch + index (crawler.go:2376-2430)
            fetch_ok = url_link in docs
            visited.add(normalize_url_seen(url_link))
            if fetch_ok:
                res.crawl_order.append((source_id, fetch_seq, current_depth + 1, url_link))
                fetch_seq += 1
                c["pages"] += 1
                page_links = extract_links(docs[url_link])
                new_links.extend(page_links)
                new_links.extend(skipped)  # web.go:1864 resurrection
            else:
                c["errors"] += 1
            skipped = []  # cleared after every attempt (crawler.go:2283)

        # level barrier — crawler.go:471-499
        if new_links:
            if cfg.max_links > 0 and (c["pages"] + len(new_links)) > cfg.max_links:
                keep = cfg.max_links - c["pages"]
                new_links = new_links[:keep] if keep > 0 else []
            c["links"] += len(new_links)
            all_links = new_links
        else:
            all_links = []
        current_depth += 1
        if cfg.max_depth == 0:
            max_depth = current_depth + 1

    res.visited = {(source_id, v) for v in visited}
    return res


def crawl_all(
    docs_list: list[dict],
    seeds: list[dict],
    cfg: OracleConfig,
    robots: list[dict] | None = None,
) -> OracleResult:
    import json as _json

    docs = {d["doc_id"]: d["spans"] for d in docs_list}
    merged = OracleResult()
    for s in seeds:
        # alternative_links ride in Sources.config JSON
        # (srcCfg["crawling_config"]["alternative_links"], crawler.go:318-326)
        alts: list[str] | None = None
        try:
            alts = _json.loads(s.get("config") or "{}").get("crawling_config", {}).get(
                "alternative_links"
            )
        except (ValueError, AttributeError):
            alts = None
        r = crawl_source(
            docs, s["source_id"], s["url"], s["restricted"], cfg, robots=robots,
            alternative_links=alts,
        )
        merged.crawl_order.extend(r.crawl_order)
        merged.visited |= r.visited
        merged.counters.update(r.counters)
    return merged


# --------------------------------------------------------------- span parse
# Independent transcription of the page-info derivation over spans
# (title/summary/body fallbacks web.go:3208-3311; keywords keywords.go).

def o_body_text(spans: list[dict]) -> str:
    parts = [s["text"] for s in sorted(spans, key=lambda x: x["offset"]) if s["kind"] in ("text", "link")]
    return re.sub(r"\s+", " ", " ".join(parts)).strip()


def o_meta_content(spans: list[dict], name: str) -> str:
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "meta" and s["text"].startswith(name + " "):
            return s["text"][len(name) + 1 :]
    return ""


def o_summary(spans: list[dict]) -> str:
    for name in ("description", "og:description", "twitter:description"):
        v = o_meta_content(spans, name).strip()
        if v:
            return v
    return o_body_text(spans)[:200]


def o_title(spans: list[dict]) -> str:
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "title" and s["text"].strip():
            return s["text"].strip()
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "text" and s["text"].strip():
            return s["text"].strip()
    return o_summary(spans)[:255]


def o_normalize_text(text: str) -> str:
    text = re.sub(r"<[^>]*>", " ", text)
    text = re.sub(r"""[.,?!:;'"(){}<>\-]""", " ", text)
    text = text.lower()
    return re.sub(r"\s+", " ", text).strip()


def o_keywords(spans: list[dict], stopwords: set[str]) -> list[str]:
    def kw(content: str) -> list[str]:
        toks = [w for w in re.split(r"[^a-z0-9]+", content.lower()) if w]
        return [w for w in toks if 3 <= len(w) <= 45 and w not in stopwords]

    all_kw = (
        kw(o_normalize_text(o_body_text(spans)))
        + kw(o_meta_content(spans, "keywords"))
        + kw(o_meta_content(spans, "description"))
    )
    seen, uniq = set(), []
    for w in all_kw:
        if w not in seen:
            seen.add(w)
            uniq.append(w)
    return sorted(uniq)
