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

#: (tag, content_patterns, url_patterns) — FULL transcription of
#: support/content_type_detection.yaml (35 rules), in file order.
#: Pattern adaptations for Java-regex + RE2 cross-compile are noted
#: inline; rules are plain data, so a deployment can swap this tuple
#: for its own ruleset (the YAML's loadable-rules contract,
#: content_type.go:64-206) without touching the operator.
DETECTION_RULES: tuple[tuple[str, tuple[str, ...], tuple[str, ...]], ...] = (
    (
        "text/html",
        (r"(?i)^[\s\n]*(?:<!DOCTYPE\s+html|<html|<head|<body|<title|<meta|<script|<div|<span|<!--|<iframe|<form)",),
        (r"(?i)\.html?(?:\?.*)?$",),
    ),
    ("text/xml", (r"(?i)^\s*<\?xml",), (r"(?i)\.xml(?:\?.*)?$",)),
    ("application/json", (r"(?i)^\s*\{.*\}", r"(?i)^\s*\[.*\]"), (r"(?i)\.json(?:\?.*)?$",)),
    (
        "text/css",
        (
            r"(?i)^\s*\:\w,?\s*",
            r"(?i)^\s*@(?:import|charset)\s+",
            r"(?i)^\s*(?:[.#]?[a-zA-Z0-9_-]+\s*[{])",
            r"(?i)^\s*@media\s*\(",
            r"(?i)^\s*@\w+\{",  # brace escaped (Java 'illegal repetition' otherwise)
        ),
        (r"(?i)\.css(?:\?.*)?$",),
    ),
    (
        "image/png",
        (r"(?i)^[\x89]PNG\r\n\x1A\n", r"(?i)^\xef\xbf\xbdPNG\r\n\x1A\n"),
        (r"(?i)\.png(?:\?.*)?$",),
    ),
    (
        "image/x-icon",
        (r"(?i)^\x00\x00\x01\x00", r"(?i)^\x89PNG\r\n\x1A\n"),
        (r"(?i)\.ico(?:\?.*)?$",),
    ),
    ("image/jpeg", (r"(?i)^\xFF\xD8",), (r"(?i)\.jpe?g(?:\?.*)?$",)),
    ("image/gif", (r"(?i)^GIF8",), (r"(?i)\.gif(?:\?.*)?$",)),
    ("image/svg+xml", (r"(?i)^\s*<svg",), (r"(?i)\.svg(?:\?.*)?$",)),
    (
        "application/javascript",
        (
            r"(?i)^\s*<script",
            r"(?i)^\s*[;]*\s*function",
            r"(?i)^\s*[;]*\s*var\s+\w+\s*=\s*function",
            r"(?i)^\s*[;]*\s*\(function\s*\(",
            r"(?i)^\s*[;]*\s*!\s*function\s*\(",
            r"(?i)^\s*[;]*\s*/\*",
            r"(?i)^\s*[;]*\s*//",
            r"(?i)^\s*[;]*\s*(?:window|global|self)\.",
        ),
        (r"(?i)\.js(?:\?.*)?$", r"(?i)^\s*data:application/x-javascript;.*"),
    ),
    ("application/pdf", (r"%PDF-",), (r"(?i)\.pdf(?:\?.*)?$",)),
    ("application/msword", (r"(?i)^\s*\{\s*\"version\"",), (r"(?i)\.doc(?:\?.*)?$",)),
    (
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        (r"(?i)^\s*\{\s*\"version\"",),
        (r"(?i)\.docx(?:\?.*)?$",),
    ),
    ("application/vnd.ms-excel", (r"(?i)^\s*\{\s*\"version\"",), (r"(?i)\.xls(?:\?.*)?$",)),
    (
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
        (r"(?i)^\s*\{\s*\"version\"",),
        (r"(?i)\.xlsx(?:\?.*)?$",),
    ),
    ("application/vnd.ms-powerpoint", (r"(?i)^\s*\{\s*\"version\"",), (r"(?i)\.ppt(?:\?.*)?$",)),
    (
        "application/vnd.openxmlformats-officedocument.presentationml.presentation",
        (r"(?i)^\s*\{\s*\"version\"",),
        (r"(?i)\.pptx(?:\?.*)?$",),
    ),
    ("application/zip", (r"PK\x03\x04",), (r"(?i)\.zip(?:\?.*)?$",)),
    ("application/x-tar", (r"^ustar",), (r"(?i)\.tar(?:\?.*)?$",)),
    ("application/gzip", (r"\x1F\x8B\x08",), (r"(?i)\.gz(?:\?.*)?$",)),
    ("application/x-bzip2", (r"^BZh",), (r"(?i)\.bz2(?:\?.*)?$",)),
    ("application/x-rar-compressed", (r"^Rar!",), (r"(?i)\.rar(?:\?.*)?$",)),
    ("application/x-msdownload", (r"^MZ",), (r"(?i)\.exe(?:\?.*)?$",)),
    ("application/x-msi", (), (r"(?i)\.msi(?:\?.*)?$",)),
    ("application/x-debian-package", (), (r"(?i)\.deb(?:\?.*)?$",)),
    ("application/x-rpm", (), (r"(?i)\.rpm(?:\?.*)?$",)),
    ("application/vnd.android.package-archive", (r"PK\x03\x04",), (r"(?i)\.apk(?:\?.*)?$",)),
    ("application/x-iso9660-image", (r"CD001",), (r"(?i)\.iso(?:\?.*)?$",)),
    ("audio/mpeg", (r"(?i)^ID3", r"(?i)\xFF\xFB"), (r"(?i)\.mp3(?:\?.*)?$",)),
    ("video/mp4", (r"(?i)^ftypmp4", r"(?i)^ftypisom"), (r"(?i)\.mp4(?:\?.*)?$",)),
    (
        "video/mp4",  # fmp4
        (r"(?i)^\x00{2}\x01hmoof", r"(?i)moof.*mdat"),
        (r"(?i)\.mp4(?:\?.*)?$", r"(?i)\.m4s(?:\?.*)?$"),
    ),
    (
        "video/mp4",  # dash_sidx
        (r"(?i)^\x00{2}\x00.*sidx",),
        (r"(?i)\.mp4(?:\?.*)?$", r"(?i)\.m4s(?:\?.*)?$"),
    ),
    ("font/woff2", (r"(?i)wOF2", r"(?i)data:font/woff2;"), (r"(?i)\.woff2(?:\?.*)?$",)),
    ("font/woff", (r"(?i)wOFF", r"(?i)data:font/woff;"), (r"(?i)\.woff(?:\?.*)?$",)),
    ("font/ttf", (r"(?i)trueType", r"(?i)data:font/ttf;"), (r"(?i)\.ttf(?:\?.*)?$",)),
)

#: full transcription of docTypeMap (extension → document type),
#: /root/reference/pkg/crawler/types.go:324-413 — values faithful to the
#: reference (inferDocumentType lowercases on lookup, web.go:3418).
DOC_TYPE_MAP: dict[str, str] = {
    "pdf": "application/pdf", "html": "text/html", "htm": "text/htm",
    "docx": "application/docx", "xlsx": "application/xlsx", "pptx": "application/pptx",
    "txt": "application/txt", "csv": "application/csv", "xml": "application/xml",
    "json": "application/json", "yaml": "application/yaml", "yml": "application/yaml",
    "tsv": "application/tsv", "rtf": "application/rtf", "doc": "application/doc",
    "xls": "application/xls", "ppt": "application/ppt", "odt": "application/odt",
    "ods": "application/ods", "odp": "application/odp", "odg": "application/odg",
    "odf": "application/odf", "sxw": "application/sxw", "sxc": "application/sxc",
    "sxi": "application/sxi", "sxd": "application/sxd", "jar": "application/jar",
    "war": "application/war", "ear": "application/ear", "zip": "application/zip",
    "tar": "application/tar", "gz": "application/gz", "bz2": "application/bz2",
    "7z": "application/7z", "rar": "application/rar", "tgz": "application/tgz",
    "tbz2": "application/tbz2", "txz": "application/txz", "lzma": "application/lzma",
    "tlz": "application/tlz", "apk": "application/apk", "exe": "application/exe",
    "dll": "application/dll", "so": "application/so", "rpm": "application/rpm",
    "deb": "application/deb", "iso": "application/iso", "img": "application/img",
    "swf": "application/swf", "flv": "application/FLV", "mpg": "application/MPG",
    "mp2": "application/MP2", "mp3": "application/MP3", "mp4": "application/MP4",
    "m4v": "application/M4V", "mov": "application/MOV", "3gp": "application/3GP",
    "avi": "application/AVI", "wmv": "application/WMV", "ogg": "application/OGG",
    "oga": "application/OGA", "ogv": "application/OGV", "ogx": "application/OGX",
    "aac": "application/AAC", "wav": "application/WAV", "mpc": "application/MPC",
    "mkv": "application/MKV", "webm": "application/WEBM", "woff": "application/WOFF",
    "woff2": "application/WOFF2", "ttf": "application/TTF", "eot": "application/EOT",
    "flac": "application/FLAC", "m4a": "application/M4A", "mid": "application/MID",
    "midi": "application/MIDI", "mka": "application/MKA", "opus": "application/OPUS",
    "ra": "application/RA", "svg": "application/SVG", "svgz": "application/SVGZ",
    "xcf": "application/XCF", "xpi": "application/XPI", "xhtml": "text/XHTML",
    "3g2": "application/3G2", "3gp2": "application/3GP2", "3gpp": "application/3GPP",
    "3gpp2": "application/3GPP2",
}

TEXT_EMPTY = "text/empty"
UNKNOWN = "unknown"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def detect_content_type(
    body: Column | str,
    url: Column | str,
    rules: tuple[tuple[str, tuple[str, ...], tuple[str, ...]], ...] = DETECTION_RULES,
) -> Column:
    """First-match-wins rule walk (content patterns, then URL patterns,
    per rule — content_type.go:165-199). ``rules`` is data: pass a
    custom (tag, content_patterns, url_patterns) tuple to mirror a
    site-specific YAML. Rules are config (small, driver-side), so they
    compile into ONE literal-regex when-chain — whole-stage codegen,
    never a per-row regex recompilation against a joined rules table."""
    b = F.trim(_col(body))
    u = F.trim(_col(url))
    out = F.when((b == "") & (u == ""), F.lit(TEXT_EMPTY))
    for tag, content_pats, url_pats in rules:
        cond = F.lit(False)
        for p in content_pats:
            cond = cond | ((b != "") & b.rlike(p))
        for p in url_pats:
            cond = cond | ((u != "") & u.rlike(p))
        out = out.when(cond, F.lit(tag))
    return out.otherwise(F.lit(UNKNOWN))


def infer_doc_type(url: Column | str) -> Column:
    """``inferDocumentType`` (web.go:3404-3429): extension →
    lower(docTypeMap[ext]) (types.go:324-413), else 'UNKNOWN'. One
    96-entry literal map lookup, JVM-side. Divergence documented: the
    query string is stripped before extension extraction (Go's
    ``filepath.Ext`` would fold ``?v=1`` into the extension and miss)."""
    ext = F.lower(F.substring_index(F.substring_index(_col(url), "?", 1), ".", -1))
    mapping = F.create_map(
        *[F.lit(x) for k, v in DOC_TYPE_MAP.items() for x in (k, v.lower())]
    )
    return F.coalesce(mapping[ext], F.lit("UNKNOWN"))


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
