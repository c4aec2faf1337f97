"""Value normalizers — vectorized re-implementations of the reference's
attribute-indexing normalizer registry.

Reference: the ``normalizers`` map in
/root/reference/pkg/crawler/attribute_indexing.go:74-107 (lowercase,
uppercase, trim, collapse_spaces, remove_punctuation, normalize_url,
normalize_email, fix_utf8, normalize_unicode, sanitize_string,
unix_to_datetime) plus ``UnixToDateTime``/``FixUTF8``/``NormalizeUnicode``
/``SanitizeString`` at :110-186.

Every normalizer that has a JVM expression stays a Column (whole-stage
codegen); NFC normalization — which has no Spark builtin — is a
vectorized pandas UDF (Arrow-batched, never per-row Python).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lowercase(c: Column | str) -> Column:
    return F.lower(_col(c))


def uppercase(c: Column | str) -> Column:
    return F.upper(_col(c))


def trim(c: Column | str) -> Column:
    return F.trim(_col(c))


def collapse_spaces(c: Column | str) -> Column:
    """``strings.Join(strings.Fields(s), " ")``: split on any whitespace
    run, re-join with single spaces (leading/trailing runs dropped)."""
    return F.regexp_replace(F.trim(_col(c)), r"\s+", " ")


def remove_punctuation(c: Column | str) -> Column:
    """Keep letters, numbers and whitespace only (rune filter,
    attribute_indexing.go:82-90). Unicode classes match Go's
    IsLetter/IsNumber/IsSpace."""
    return F.regexp_replace(_col(c), r"[^\p{L}\p{N}\s]", "")


def normalize_email(c: Column | str) -> Column:
    """lower(trim(s)) — attribute_indexing.go:101-103."""
    return F.lower(F.trim(_col(c)))


def normalize_url_attr(c: Column | str) -> Column:
    """Lowercase scheme+host, strip ``#fragment`` — the attribute-level
    URL normalizer (attribute_indexing.go:91-100). Distinct from the
    crawl-frontier normalizers in :mod:`thecrowler_spark.functions.urls`."""
    s = _col(c)
    no_frag = F.regexp_replace(s, r"#.*$", "")
    prefix = F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)", 1)
    # substring after the scheme://host prefix, JVM-side:
    rest = F.substring(no_frag, F.length(prefix) + 1, F.lit(2147483647))
    return F.when(prefix == "", no_frag).otherwise(F.concat(F.lower(prefix), rest))


def unix_to_datetime(c: Column | str) -> Column:
    """Numeric epoch string → RFC 3339 UTC; non-numeric passes through.

    Reference ``UnixToDateTime`` attribute_indexing.go:110-132: integers
    > 9999999999 are milliseconds (÷1000); output like
    ``2024-01-02T03:04:05Z``.
    """
    s = F.trim(_col(c))
    is_int = s.rlike(r"^-?[0-9]+$")
    # try_cast: a >19-digit numeric token passes the rlike guard but
    # overflows BIGINT — ANSI mode would kill the job on cast()
    v = s.try_cast("long")
    secs = F.when(v > 9999999999, (v / 1000).cast("long")).otherwise(v)
    iso = F.concat(
        F.date_format(F.to_utc_timestamp(F.timestamp_seconds(secs), "UTC"), "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit("Z"),
    )
    return F.when(s == "", s).when(is_int & v.isNotNull(), iso).otherwise(s)


def fix_utf8(c: Column | str) -> Column:
    """Strip NULs and control chars except \\n and \\t
    (attribute_indexing.go:136-160 keeps ONLY \\n and \\t — \\r is
    stripped too). Spark strings are already valid UTF-8, so the
    ToValidUTF8 step is a no-op here."""
    return F.regexp_replace(_col(c), r"[\x00-\x08\x0B-\x1F\x7F]", "")


#: sanitize_string keeps graphic+space runes minus controls — for valid
#: UTF-8 input this is the same filter as fix_utf8
#: (attribute_indexing.go:165-186).
sanitize_string = fix_utf8


@pandas_udf(StringType())
def normalize_unicode(s: pd.Series) -> pd.Series:
    """Unicode NFC composition (attribute_indexing.go:163) — no Spark
    builtin exists; Arrow-vectorized pandas UDF."""
    return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)


#: Registry mirroring the reference map (attribute_indexing.go:74-107).
#: Values are Column-producing callables.
NORMALIZERS = {
    "lowercase": lowercase,
    "uppercase": uppercase,
    "trim": trim,
    "collapse_spaces": collapse_spaces,
    "remove_punctuation": remove_punctuation,
    "normalize_url": normalize_url_attr,
    "normalize_email": normalize_email,
    "fix_utf8": fix_utf8,
    "sanitize_string": sanitize_string,
    "unix_to_datetime": unix_to_datetime,
    "normalize_unicode": lambda c: normalize_unicode(_col(c)),
}


def apply_normalizers(c: Column | str, names: list[str] | tuple[str, ...]) -> Column:
    """Fold a normalizer chain left-to-right (the reference applies the
    config-declared list in order)."""
    out = _col(c)
    for n in names:
        key = n.strip().lower()
        if key not in NORMALIZERS:
            raise KeyError(f"unknown normalizer: {n!r}")
        out = NORMALIZERS[key](out)
    return out
