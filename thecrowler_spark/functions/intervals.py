"""Interval-string parsing — the scheduler's timeout/interval grammar.

Reference: ``parseProcessingTimeout`` + ``clampDuration``
(/root/reference/pkg/crawler/crawler.go:541-644): trim+lowercase;
empty → 20 min (returned UNclamped); space-prefixed unit words
normalized to compact units; ``^(\\d+)\\s*(unit)$`` with s/m/h/d/w/mo/y
multipliers (months=30d, years=365d); otherwise Go ``time.ParseDuration``
(compound ``XhYmZs``), invalid → 20 min; clamp: >24h → 24h, <1s → 30s,
then **minus one second whenever the result exceeds 1s** (the
reference's deliberate off-by-one, crawler.go:637-639).

All vectorized Column expressions — this parser also runs over per-seed
config columns (Sources.config intervals), not just driver config.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: unit → seconds (crawler.go:575-602; mo/y approximate 30/365 days)
UNIT_SECONDS = {
    "s": 1, "sec": 1, "secs": 1, "second": 1, "seconds": 1,
    "m": 60, "minute": 60, "minutes": 60, "mutes": 60,
    "h": 3600, "hr": 3600, "hrs": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "week": 604800, "weeks": 604800,
    "mo": 2592000, "month": 2592000, "months": 2592000,
    "y": 31536000, "year": 31536000, "years": 31536000,
}

_UNIT_ALT = "|".join(sorted(UNIT_SECONDS, key=len, reverse=True))
_SIMPLE_RE = rf"^(\d+)\s*({_UNIT_ALT})$"
_COMPOUND_RE = r"^(?:(\d+)h)?(?:(\d+)m)?(?:(\d+)s)?$"

_DEFAULT = 20 * 60  # 20 minutes


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _clamp(secs: Column) -> Column:
    """clampDuration crawler.go:629-644 (incl. the −1s quirk)."""
    s = F.when(secs < 0, F.lit(_DEFAULT)).otherwise(secs)
    s = F.when(s > 86400, F.lit(86400)).otherwise(s)
    s = F.when(s < 1, F.lit(30)).otherwise(s)
    return F.when(s > 1, s - 1).otherwise(s)


def parse_interval_seconds(c: Column | str) -> Column:
    """Interval string → seconds (long), per parseProcessingTimeout."""
    t = F.lower(F.trim(_col(c)))
    # space-prefixed word units → compact (crawler.go:551-571)
    for old, new in (
        (" minutes", "m"), (" minute", "m"), (" mins", "m"), (" min", "m"),
        (" hours", "h"), (" hour", "h"), (" hrs", "h"), (" hr", "h"),
        (" seconds", "s"), (" second", "s"), (" secs", "s"), (" sec", "s"),
    ):
        t = F.replace(t, F.lit(old), F.lit(new))

    num = F.regexp_extract(t, _SIMPLE_RE, 1)
    unit = F.regexp_extract(t, _SIMPLE_RE, 2)
    unit_secs = F.lit(None).cast("long")
    for u, mult in UNIT_SECONDS.items():
        unit_secs = F.when(unit == u, F.lit(mult)).otherwise(unit_secs)
    simple = (num.try_cast("long") * unit_secs).cast("long")

    # time.ParseDuration fallback, compound h/m/s subset ("1h30m")
    ch = F.regexp_extract(t, _COMPOUND_RE, 1)
    cm = F.regexp_extract(t, _COMPOUND_RE, 2)
    cs = F.regexp_extract(t, _COMPOUND_RE, 3)
    compound_valid = t.rlike(_COMPOUND_RE) & (t != "") & ((ch != "") | (cm != "") | (cs != ""))
    compound = (
        F.coalesce(ch.try_cast("long"), F.lit(0)) * 3600
        + F.coalesce(cm.try_cast("long"), F.lit(0)) * 60
        + F.coalesce(cs.try_cast("long"), F.lit(0))
    )

    return (
        F.when(t == "", F.lit(_DEFAULT).cast("long"))  # unclamped (crawler.go:545-547)
        .when(num != "", _clamp(simple))
        .when(compound_valid, _clamp(compound))
        .otherwise(_clamp(F.lit(_DEFAULT)))
    ).alias("interval_seconds")


def parse_interval_seconds_py(s: str | None) -> int:
    """Scalar twin of :func:`parse_interval_seconds` — same grammar,
    same clamp (incl. the −1 s quirk), for DRIVER-side config strings
    (the claim eligibility cutoffs are scalars, not columns, so the
    cutoff timestamps can be plan literals instead of per-row regex
    work). tests/test_intervals.py asserts scalar ≡ Column on a
    battery so the two can't drift.
    """
    import re

    t = (s or "").strip().lower()
    for old, new in (
        (" minutes", "m"), (" minute", "m"), (" mins", "m"), (" min", "m"),
        (" hours", "h"), (" hour", "h"), (" hrs", "h"), (" hr", "h"),
        (" seconds", "s"), (" second", "s"), (" secs", "s"), (" sec", "s"),
    ):
        t = t.replace(old, new)
    if t == "":
        return _DEFAULT  # unclamped, crawler.go:545-547

    def clamp(v: int) -> int:
        if v < 0:
            v = _DEFAULT
        if v > 86400:
            v = 86400
        if v < 1:
            v = 30
        return v - 1 if v > 1 else v

    m = re.match(_SIMPLE_RE, t)
    if m:
        return clamp(int(m.group(1)) * UNIT_SECONDS[m.group(2)])
    m = re.match(_COMPOUND_RE, t)
    if m and any(g for g in m.groups()):
        h, mi, se = (int(g) if g else 0 for g in m.groups())
        return clamp(h * 3600 + mi * 60 + se)
    return clamp(_DEFAULT)


def parse_interval_seconds_exact_py(s: str | None) -> int:
    """Same grammar as :func:`parse_interval_seconds_py`, WITHOUT the
    crawler pacing clamps (−1 s quirk, 86400 cap, <1→30): eligibility
    cutoffs for claim timeouts are exact ``now − interval`` in the
    reference (``updateInformationSeeds`` uses ``to_minutes(60)``
    directly), so '1 hour' must mean 3600 s here, not 3599 (ADVICE r5,
    infoseed.py:68). Empty/unparseable falls back to the same default
    seconds, unmodified."""
    import re

    t = (s or "").strip().lower()
    for old, new in (
        (" minutes", "m"), (" minute", "m"), (" mins", "m"), (" min", "m"),
        (" hours", "h"), (" hour", "h"), (" hrs", "h"), (" hr", "h"),
        (" seconds", "s"), (" second", "s"), (" secs", "s"), (" sec", "s"),
    ):
        t = t.replace(old, new)
    if t == "":
        return _DEFAULT
    m = re.match(_SIMPLE_RE, t)
    if m:
        return int(m.group(1)) * UNIT_SECONDS[m.group(2)]
    m = re.match(_COMPOUND_RE, t)
    if m and any(g for g in m.groups()):
        h, mi, se = (int(g) if g else 0 for g in m.groups())
        return h * 3600 + mi * 60 + se
    return _DEFAULT


def pacing_delay_seconds(
    url: Column | str, lo: float, hi: float, seed: int = 42
) -> Column:
    """Seed-pinned rendering of the ``random(lo, hi)`` pacing expression
    (/root/reference/pkg/exprterpreter/exprterpreter.go:144-190, default
    interval ``random(1,3)`` in config.default:79).

    The reference draws true randomness per fetch; a distributed,
    *resumable* scheduler needs the same draw on every replay, so the
    draw is a hash of (url, seed): uniform in [lo, hi), reproducible,
    shuffle-free. Minimum effective sleep 3 s per web.go:1312-1321.
    """
    frac = F.conv(F.substring(F.md5(F.concat(_col(url), F.lit(f"#{seed}"))), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(16**8))
    delay = F.lit(float(lo)) + frac * F.lit(float(hi - lo))
    return F.greatest(delay, F.lit(3.0))


def parse_pacing_expr(expr: str) -> tuple[float, float]:
    """Parse the reference's pacing config expression into (lo, hi).

    Reference: the ``exprterpreter`` evaluates strings like ``"2"`` or
    ``"random(1, 3)"`` per fetch (/root/reference/pkg/exprterpreter/
    exprterpreter.go:144-242; shipped default ``random(1,3)``,
    config.default:79). Driver-side (config parse, not data plane);
    the per-URL draw itself is :func:`pacing_delay_seconds`.
    """
    import re

    t = (expr or "").strip().lower()
    if t == "":
        return (0.0, 0.0)
    m = re.match(r"^random\(\s*([0-9.]+)\s*,\s*([0-9.]+)\s*\)$", t)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return (min(lo, hi), max(lo, hi))
    try:
        v = float(t)
    except ValueError:
        return (0.0, 0.0)  # exprterpreter falls back to 0 on parse failure
    return (v, v)
