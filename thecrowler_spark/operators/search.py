"""Search: the reference's "dorking" query language compiled to Columns.

Reference pipeline (/root/reference/pkg/search/search.go:39-110,
tokenizer.go:55-130,490-510): tokenize (quoted phrases, ``\\`` escape,
``field:term`` OR ``field=term`` — ``:``/``=`` end a specifier only
when it passes ``isValidSpecifier`` (tokenizer.go:82-86,199-207),
``|`` = OR, ``&`` = AND, bare juxtaposition = AND) → per-token
``&limit:N``/``&limit=N``/``&offset`` control-modifier extraction
(tokenizer.go:329-330,561-574) → compile each term to a
case-insensitive ``LIKE %term%`` over the default fields → prepend the
star join (/root/reference/pkg/search/sql_templates.go:5-56).

Here: the same token grammar compiled to a Catalyst Column predicate —
the filter then pushes into the scan for free.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: searchable fields → column names (SearchIndex star analog)
DEFAULT_FIELDS = ("title", "summary", "body_text")
#: reference specifiers (isValidSpecifier, tokenizer.go:199-207) mapped
#: to our page-schema columns, plus documented extensions (body/url/lang)
FIELD_ALIASES = {
    "title": "title",
    "summary": "summary",
    "content": "body_text",
    "file_type": "file_type",
    "body": "body_text",  # extension
    "url": "doc_id",  # extension
    "lang": "detected_lang",  # extension
}

#: the reference's full valid-specifier set (tokenizer.go:199-207);
#: 'details'/'&details' compile to the JSON details probe, 'limit' /
#: 'offset' are control words handled by extract_control_modifier
VALID_SPECIFIERS = frozenset(
    ("title", "summary", "content", "details", "&details", "offset", "&offset",
     "limit", "&limit", "file_type")
) | frozenset(FIELD_ALIASES)

#: '&' is an operator only when doubled or space-surrounded
#: (tokenizer.go:96-118); otherwise it stays inside the token — URL
#: query strings ("?a=1&b=2") and attached control modifiers
#: ("term&limit:10") survive as one token.
_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?:[^"\\]|\\.)*"            # quoted phrase
      | \|                           # OR operator
      | &&                           # doubled AND operator
      | &(?=\s|$)                    # standalone space-delimited AND
      | (?:[^\s|&]|&(?!&)(?!\s))+    # bare term (may embed ':'/'='/&modifier)
    )
    """,
    re.VERBOSE,
)


def is_valid_specifier(spec: str) -> bool:
    """``isValidSpecifier`` tokenizer.go:199-207: ``@``-prefixed JSON
    paths plus the fixed word list; anything else keeps its ':'/'='
    literal (so ``foo:bar`` is a substring term, not a field probe)."""
    return spec.startswith("@") or spec.lower() in VALID_SPECIFIERS


def extract_control_modifier(value: str, name: str, current: int | None):
    """``extractControlModifier`` tokenizer.go:561-574, transcribed:
    find ``&name:`` or ``&name=``; the REMAINDER of the token is the
    integer value (so modifiers sit at a token's end); parse failure
    leaves the token intact."""
    for sep in (":", "="):
        marker = f"&{name}{sep}"
        idx = value.find(marker)
        if idx >= 0:
            mod = value[idx + len(marker):]
            try:
                current = int(mod)
                value = value[:idx]
            except ValueError:
                pass
            break
    return value, current


def tokenize(query: str) -> list[str]:
    """Token stream per tokenizer.go:55-130 (quotes + escapes kept)."""
    return [m.group(1) for m in _TOKEN_RE.finditer(query)]


def parse_query(query: str, limit: int | None = None, offset: int = 0):
    """Tokenize + per-token control-modifier extraction
    (tokenizer.go:329-330: limit first, then offset, on every token).
    Returns (tokens, limit, offset); tokens emptied by extraction drop.
    Note: '&' is both the AND operator (whitespace-separated) and the
    modifier marker (inside a token) — the tokenizer already split
    standalone '&', so only embedded '&limit'/' &offset' reach here."""
    out: list[str] = []
    for t in tokenize(query):
        if t not in ("|", "&") and '"' not in t:
            t, limit = extract_control_modifier(t, "limit", limit)
            t, offset = extract_control_modifier(t, "offset", offset)
        if t:
            out.append(t)
    return out, limit, offset


#: column holding the semi-structured details JSON probed by @path terms
#: (reference: WebObjects.details JSONB, tokenizer.go:343-360 compiles
#: ``@a.b.c:v`` to a ``details->'a'->'b'->>'c' LIKE`` accessor chain)
JSON_DETAILS_COL = "details"


_SEP_RE = re.compile(r"^([^:=]*)([:=])(.*)$", re.DOTALL)


def _term_predicate(term: str, default_fields: tuple[str, ...] = DEFAULT_FIELDS) -> Column:
    field = None
    json_path = None
    details_probe = False
    if '"' not in term:
        m = _SEP_RE.match(term)
        if m and m.group(3) and is_valid_specifier(m.group(1)):
            spec, rest = m.group(1), m.group(3)
            low = spec.lower()
            if spec.startswith("@"):
                json_path, term = "$." + spec[1:], rest
            elif low in ("details", "&details"):
                details_probe, term = True, rest
            elif low in FIELD_ALIASES:
                field, term = FIELD_ALIASES[low], rest
            # bare 'limit:'/'offset:' specifiers fall through as literal
            # terms (the &-marked forms are the control-modifier path)
    if term.startswith('"') and term.endswith('"') and len(term) >= 2:
        term = term[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    like = f"%{term.lower()}%"
    if json_path:
        return F.lower(F.get_json_object(F.col(JSON_DETAILS_COL), json_path)).like(like)
    if details_probe:
        # 'details:v' probes the whole semi-structured blob as text
        # (WebObjects.details::text LIKE, sql_templates.go)
        return F.lower(F.col(JSON_DETAILS_COL).cast("string")).like(like)
    if field:
        return F.lower(F.col(field)).like(like)
    pred = F.lit(False)
    for f_ in default_fields:
        pred = pred | F.lower(F.col(f_)).like(like)
    return pred


def _compile_tokens(
    tokens: list[str], default_fields: tuple[str, ...] = DEFAULT_FIELDS
) -> Column:
    or_groups: list[list[str]] = [[]]
    for t in tokens:
        if t == "|":
            or_groups.append([])
        elif t in ("&", "&&"):
            continue
        else:
            or_groups[-1].append(t)
    result = F.lit(False)
    for group in or_groups:
        if not group:
            continue
        g = F.lit(True)
        for term in group:
            g = g & _term_predicate(term, default_fields)
        result = result | g
    return result


def compile_search(query: str) -> Column:
    """Compile a dorking query to one Column predicate.

    Grammar: OR ('|') binds looser than AND ('&'/'&&' or juxtaposition)
    — i.e. ``a b | c`` = (a AND b) OR c. Control modifiers are stripped
    (use :func:`search` or :func:`parse_query` to consume them).
    """
    tokens, _, _ = parse_query(query)
    return _compile_tokens(tokens)


def search(pages: DataFrame, query: str, limit: int = 10, offset: int = 0) -> DataFrame:
    """DISTINCT + recency order + limit/offset, per the reference
    templates (sql_templates.go:6,49; search.go:112-130 defaults —
    reference default limit is 10). In-query ``&limit``/``&offset``
    control modifiers override the arguments (tokenizer.go:329-330)."""
    tokens, limit, offset = parse_query(query, limit, offset)
    out = pages.filter(_compile_tokens(tokens)).dropDuplicates(["doc_id"])
    out = out.orderBy(F.desc("doc_id"))
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def bare_terms(tokens: list[str]) -> list[str]:
    """Terms that hit the DEFAULT fields (no valid specifier) — these
    also join the appended keyword-equality group
    (buildCombinedQuery keyword group, tokenizer.go:520-531)."""
    out = []
    for t in tokens:
        if t in ("|", "&", "&&"):
            continue
        m = _SEP_RE.match(t)
        if m and m.group(3) and is_valid_specifier(m.group(1)):
            continue
        if t.startswith('"') and t.endswith('"') and len(t) >= 2:
            t = t[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        out.append(t.lower())
    return out


def search_entity_star(
    entity: DataFrame,
    bridge: DataFrame | None,
    search_index: DataFrame,
    query: str,
    entity_cols: tuple[str, ...],
    link_col: str | None,
    keyword_index: DataFrame | None = None,
    source_search_index: DataFrame | None = None,
    sources: DataFrame | None = None,
    si_fields: tuple[str, ...] = ("title", "summary"),
) -> DataFrame:
    """Per-entity search template family (sql_templates.go:58-287:
    Screenshots / WebObjects / ScrapedData / NetInfo / HTTPInfo bodies).

    Shape, faithful to every template: entity JOIN bridge JOIN
    SearchIndex, LEFT JOIN the keyword chain, LEFT JOIN the source
    chain; WHERE = non-empty ``link_col`` guard AND (the compiled
    dorking predicate over the SearchIndex text fields OR exact keyword
    equality for the query's bare terms — buildCombinedQuery's appended
    keyword group); DISTINCT projection with ``COALESCE(source_uid,
    '')``. ``link_col=None`` drops the guard — the NetInfo / HTTPInfo
    bodies (sql_templates.go:247-287) project no page link and filter
    on the compiled predicate alone.

    Plan shape: every join is an equi-join (bridge/index_id/keyword/
    source_id); sources is a broadcast dimension; DISTINCT is one
    shuffle on the (small) projection.
    """
    tokens, _, _ = parse_query(query)
    pred = _compile_tokens(tokens, default_fields=si_fields)

    if bridge is not None:
        ent_keys = [c for c in bridge.columns if c in entity.columns]
        df = entity.join(bridge, ent_keys)
    else:
        # Screenshots-shaped entities carry index_id directly
        # (sqlScreenshotBody: `s.index_id = si.index_id`, no bridge table)
        df = entity
    df = df.join(search_index.select("index_id", *si_fields), "index_id")

    kw_pred = F.lit(False)
    if keyword_index is not None:
        bares = bare_terms(tokens)
        df = df.join(keyword_index.select("index_id", "keyword"), "index_id", "left")
        if bares:
            kw_pred = F.col("keyword").isin(*bares)

    proj: list[Column] = []
    if source_search_index is not None and sources is not None:
        df = df.join(source_search_index.select("index_id", "source_id"), "index_id", "left")
        df = df.join(
            F.broadcast(sources.select("source_id", "source_uid")), "source_id", "left"
        )
        proj.append(F.coalesce(F.col("source_uid"), F.lit("")).alias("source_uid"))
    proj.extend(F.col(c) for c in entity_cols)

    guard = (
        F.col(link_col).isNotNull() & (F.col(link_col) != "")
        if link_col is not None
        else F.lit(True)
    )
    return df.filter(guard & (pred | kw_pred)).select(*proj).distinct()
