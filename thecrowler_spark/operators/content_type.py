"""Content-type detection: regex rules + extension map + HTML sniffing.

Reference: ``detectContentType`` walks a YAML rule map (per rule:
content patterns first, then URL patterns; first match wins; empty
body+url → 'text/empty'; no match → 'unknown')
(/root/reference/pkg/crawler/content_type.go:146-206, rules file
/root/reference/support/content_type_detection.yaml). The fallback
extension map is /root/reference/pkg/crawler/types.go:324-413
(:mod:`..operators.multimodal`. ``EXT_TYPE_MAP``). HTML sniffing:
``looksLikeHTML``/``sniffHTML`` /root/reference/pkg/crawler/web.go:3044-3089.

Documented divergence: the reference iterates a Go map, so its rule
ORDER is randomized per process — unmatchable by design. We pin a
deterministic rule order (the YAML file order), which is strictly more
reproducible.

Spark rendering: one ``when``-chain of ``rlike`` predicates — all
JVM-side regex, whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (tag, content_patterns, url_patterns) — transcribed subset of
#: support/content_type_detection.yaml, in file order.
DETECTION_RULES: tuple[tuple[str, tuple[str, ...], tuple[str, ...]], ...] = (
    (
        "text/html",
        (r"(?i)^[\s\n]*(?:<!DOCTYPE\s+html|<html|<head|<body|<title|<meta|<script|<div|<span|<!--|<iframe|<form)",),
        (r"(?i)\.html?(\?.*)?$",),
    ),
    ("text/xml", (r"(?i)^\s*<\?xml",), (r"(?i)\.xml(\?.*)?$",)),
    ("application/json", (r"(?i)^\s*\{.*\}", r"(?i)^\s*\[.*\]"), (r"(?i)\.json(\?.*)?$",)),
    ("text/css", (r"(?i)^\s*@(import|charset)\s+", r"(?i)^\s*([.#]?[a-zA-Z0-9_-]+\s*\{)"), (r"(?i)\.css(\?.*)?$",)),
    ("image/png", (r"^\x89PNG",), (r"(?i)\.png(\?.*)?$",)),
    ("image/jpeg", (r"^\xff\xd8",), (r"(?i)\.jpe?g(\?.*)?$",)),
    ("image/gif", (r"^GIF8",), (r"(?i)\.gif(\?.*)?$",)),
    ("application/pdf", (r"^%PDF-",), (r"(?i)\.pdf(\?.*)?$",)),
)

TEXT_EMPTY = "text/empty"
UNKNOWN = "unknown"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def detect_content_type(body: Column | str, url: Column | str) -> Column:
    """First-match-wins rule walk (content patterns, then URL patterns,
    per rule — content_type.go:165-199)."""
    b = F.trim(_col(body))
    u = F.trim(_col(url))
    out = F.when((b == "") & (u == ""), F.lit(TEXT_EMPTY))
    for tag, content_pats, url_pats in DETECTION_RULES:
        cond = F.lit(False)
        for p in content_pats:
            cond = cond | ((b != "") & b.rlike(p))
        for p in url_pats:
            cond = cond | ((u != "") & u.rlike(p))
        out = out.when(cond, F.lit(tag))
    return out.otherwise(F.lit(UNKNOWN))


def looks_like_html(body: Column | str) -> Column:
    """``looksLikeHTML`` web.go:3044-3053: lowercase-trim then marker
    containment."""
    s = F.lower(F.trim(_col(body)))
    return (
        s.contains("<html")
        | s.contains("<!doctype html")
        | s.contains("<head")
        | s.contains("<body")
    )


def sniff_html(body: Column | str, max_bytes: int = 512) -> Column:
    """``sniffHTML`` web.go:3057-3086: first 512 bytes, strip leading
    NUL/TAB/LF/CR/space, lowercase, doctype prefix or marker containment
    (adds '<meta charset' to the marker set)."""
    head = F.substring(_col(body), 1, max_bytes)
    lb = F.lower(F.regexp_replace(head, r"^[\x00\t\n\r ]+", ""))
    return (
        lb.startswith("<!doctype html")
        | lb.contains("<html")
        | lb.contains("<head")
        | lb.contains("<body")
        | lb.contains("<meta charset")
    )
