"""exprterpreter parity (pure Python — no Spark session needed)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from thecrowler_spark.functions import exprdsl as X

NOW = datetime(2024, 3, 5, 12, 30, 45, tzinfo=timezone.utc)


def rng_lo(lo, hi):
    return lo


def rng_hi(lo, hi):
    return hi


def test_plain_values_pass_through():
    assert X.evaluate("42") == "42"
    assert X.evaluate("  hello ") == "hello"


def test_random_inclusive_bounds_and_validation():
    assert X.evaluate("random(1, 3)", rng=rng_lo) == "1"
    assert X.evaluate("random(1, 3)", rng=rng_hi) == "3"
    with pytest.raises(X.ExprError, match="expects 2 arguments"):
        X.evaluate("random(1)")
    with pytest.raises(X.ExprError, match="min argument must be less"):
        X.evaluate("random(3, 3)")
    with pytest.raises(X.ExprError, match="invalid min"):
        X.evaluate("random(x, 3)")


def test_nested_commands():
    # random(random(1,3), 10) — parser recursion (ParseCmd depth+1)
    assert X.evaluate("random(random(1, 3), 10)", rng=rng_lo) == "1"
    assert X.evaluate("random(random(1, 3), 10)", rng=rng_hi) == "10"


def test_param_split_respects_quotes_and_parens():
    cmd = X.parse_cmd('random(1, 3)')
    assert [a.arg_value for a in cmd.args] == ["1", "3"]
    with pytest.raises(X.ExprError, match="unmatched"):
        X.parse_cmd('random("1, 3)')
    with pytest.raises(X.ExprError, match="unmatched"):
        X.parse_cmd("random((1, 3)")


def test_time_tokens_pinned():
    assert X.evaluate("time(unix)", now=NOW) == str(int(NOW.timestamp()))
    assert X.evaluate("time(unixnano)", now=NOW) == str(int(NOW.timestamp() * 1_000_000_000))
    # Go time.RFC3339: UTC offset is 'Z', never '+0000'
    assert X.evaluate("time(rfc3339)", now=NOW) == "2024-03-05T12:30:45Z"
    assert "2024-03-05" in X.evaluate("time(now)", now=NOW)
    # Go custom layout
    assert X.evaluate("time(2006-01-02)", now=NOW) == "2024-03-05"
    with pytest.raises(X.ExprError, match="invalid time format"):
        X.evaluate("time(bogus)", now=NOW)


def test_time_nested_random_drawn_once():
    # args[0] must be interpreted ONCE: a nested random() inside time()
    # is a single draw, reused for both the token check and the layout.
    calls = []

    def rng(lo, hi):
        calls.append((lo, hi))
        return 2006  # Go layout year token

    assert X.evaluate("time(random(2005, 2007))", now=NOW, rng=rng) == "2024"
    assert len(calls) == 1


def test_url_placeholder():
    assert X.evaluate("url()") == "*"


def test_get_float_fallback_contract():
    # numbers pass; evaluation failures fall back to 1 (Go GetFloat)
    assert X.get_float("2.5") == 2.5
    assert X.get_float("random(1,3)", rng=rng_hi) == 3.0
    assert X.get_float("random(zzz)") == 1.0
    assert X.get_int("random(5, 9)", rng=rng_lo) == 5


def test_recursion_depth_cap():
    deep = "random(" * 20 + "1, 2" + ")" * 20
    with pytest.raises(X.ExprError):
        X.parse_cmd(deep)
