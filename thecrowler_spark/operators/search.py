"""Search: the reference's "dorking" query language compiled to Columns.

Reference pipeline (/root/reference/pkg/search/search.go:39-110,
tokenizer.go:55-130,490-510): tokenize (quoted phrases, ``\\`` escape,
``field:term``, ``|`` = OR, ``&`` = AND, bare juxtaposition = AND) →
compile each term to a case-insensitive ``LIKE %term%`` over the
default fields → prepend the star join
(/root/reference/pkg/search/sql_templates.go:5-56).

Here: the same token grammar compiled to a Catalyst Column predicate —
the filter then pushes into the scan for free.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: searchable fields → column names (SearchIndex star analog)
DEFAULT_FIELDS = ("title", "summary", "body_text")
FIELD_ALIASES = {
    "title": "title",
    "summary": "summary",
    "body": "body_text",
    "url": "doc_id",
    "lang": "detected_lang",
}

_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?:[^"\\]|\\.)*"          # quoted phrase
      | [|&]                       # operators
      | [^\s|&]+                   # bare term (may be field:term)
    )
    """,
    re.VERBOSE,
)


def tokenize(query: str) -> list[str]:
    """Token stream per tokenizer.go:55-130 (quotes + escapes kept)."""
    return [m.group(1) for m in _TOKEN_RE.finditer(query)]


#: column holding the semi-structured details JSON probed by @path terms
#: (reference: WebObjects.details JSONB, tokenizer.go:343-360 compiles
#: ``@a.b.c:v`` to a ``details->'a'->'b'->>'c' LIKE`` accessor chain)
JSON_DETAILS_COL = "details"


def _term_predicate(term: str) -> Column:
    field = None
    json_path = None
    if term.startswith("@") and ":" in term:
        spec, rest = term[1:].split(":", 1)
        if spec and rest:
            json_path, term = "$." + spec, rest
    elif '"' not in term and ":" in term:
        prefix, rest = term.split(":", 1)
        if prefix.lower() in FIELD_ALIASES and rest:
            field, term = FIELD_ALIASES[prefix.lower()], rest
    if term.startswith('"') and term.endswith('"') and len(term) >= 2:
        term = term[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    like = f"%{term.lower()}%"
    if json_path:
        return F.lower(F.get_json_object(F.col(JSON_DETAILS_COL), json_path)).like(like)
    if field:
        return F.lower(F.col(field)).like(like)
    pred = F.lit(False)
    for f_ in DEFAULT_FIELDS:
        pred = pred | F.lower(F.col(f_)).like(like)
    return pred


def compile_search(query: str) -> Column:
    """Compile a dorking query to one Column predicate.

    Grammar: OR ('|') binds looser than AND ('&' or juxtaposition) —
    i.e. ``a b | c`` = (a AND b) OR c.
    """
    tokens = tokenize(query)
    or_groups: list[list[str]] = [[]]
    for t in tokens:
        if t == "|":
            or_groups.append([])
        elif t == "&":
            continue
        else:
            or_groups[-1].append(t)
    result = F.lit(False)
    for group in or_groups:
        if not group:
            continue
        g = F.lit(True)
        for term in group:
            g = g & _term_predicate(term)
        result = result | g
    return result


def search(pages: DataFrame, query: str, limit: int = 10, offset: int = 0) -> DataFrame:
    """DISTINCT + recency order + limit/offset, per the reference
    templates (sql_templates.go:6,49; search.go:112-130 defaults)."""
    out = pages.filter(compile_search(query)).dropDuplicates(["doc_id"])
    out = out.orderBy(F.desc("doc_id"))
    if offset:
        out = out.offset(offset)
    return out.limit(limit)
