"""The config expression micro-interpreter ("exprterpreter").

Reference: /root/reference/pkg/exprterpreter/exprterpreter.go:31-242 and
types.go:29-36 — crawl configs embed tiny expressions in string fields
(pacing intervals ``random(1,3)``, timestamps ``time(unix)``, the
current-URL placeholder ``url()``), parsed into a recursive EncodedCmd
tree and evaluated to a string.

These are CONFIG-TIME scalars evaluated on the driver (the reference
evaluates them per fetch inside its worker loop; our distributed
rendering of the only shipped use — pacing — is
:func:`.intervals.pacing_delay_seconds`, which draws the per-row value
from a seed-pinned JVM hash so executors never run Python). This module
keeps full grammar parity so every config string the reference accepts
evaluates here too:

- ``random(min, max)`` — exprterpreter.go:155-198: exactly 2 int args,
  ``min < max`` required, inclusive range.
- ``time(fmt)`` — :200-232: unix | unixnano | rfc3339 | now | a Go
  layout string (validated by round-tripping the reference timestamp).
- ``url()`` — :148-149: placeholder, evaluates to ``"*"``.
- nesting (``random(random(1,3), 10)``), quote- and paren-aware comma
  splitting (:96-137), recursion depth cap.

Determinism knobs the Go code lacks (injected, never global state):
``rng(lo, hi)`` and ``now`` make evaluation reproducible in tests and
in distributed plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

TOKEN_PARAM = -1
TOKEN_RANDOM = 1
TOKEN_TIME = 2
TOKEN_URL = 3

#: commandTokenMap, types.go:29-36
COMMAND_TOKENS = {"random": TOKEN_RANDOM, "time": TOKEN_TIME, "url": TOKEN_URL}

MAX_RECURSION_DEPTH = 16


@dataclass
class EncodedCmd:
    token: int
    args: list["EncodedCmd"] = field(default_factory=list)
    arg_value: str = ""


class ExprError(ValueError):
    pass


def _command_token(command: str) -> tuple[int, bool]:
    name = command.split("(", 1)[0]
    return COMMAND_TOKENS.get(name, 0), name in COMMAND_TOKENS


def _parse_params(param_string: str) -> list[str]:
    """Comma split honoring quotes and nested parens
    (parseParams, exprterpreter.go:96-137)."""
    params: list[str] = []
    cur: list[str] = []
    in_quotes = False
    level = 0
    for ch in param_string:
        if ch == '"':
            in_quotes = not in_quotes
        if not in_quotes:
            if ch == "(":
                level += 1
            elif ch == ")" and level > 0:
                level -= 1
        if ch == "," and not in_quotes and level == 0:
            params.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if in_quotes or level != 0:
        raise ExprError("unmatched quotes or parentheses in parameters")
    params.append("".join(cur).strip())
    return params


def parse_cmd(command: str, depth: int = 0) -> EncodedCmd:
    """ParseCmd (exprterpreter.go:31-79): recursive command tree."""
    if depth > MAX_RECURSION_DEPTH:
        raise ExprError("exceeded maximum recursion depth")
    command = command.strip()
    token, is_cmd = _command_token(command)
    if is_cmd and "(" in command and command.endswith(")"):
        param_string = command[command.index("(") + 1 : -1]
        encoded_args: list[EncodedCmd] = []
        for param in _parse_params(param_string):
            p = param.strip()
            if _command_token(p)[1]:
                nested = parse_cmd(p, depth + 1)
                nested.arg_value = p
                encoded_args.append(nested)
            else:
                encoded_args.append(EncodedCmd(TOKEN_PARAM, [], p))
        return EncodedCmd(token, encoded_args, "")
    return EncodedCmd(TOKEN_PARAM, [], command)


#: Go reference-layout → strftime, enough for the layouts crawl configs
#: use; unknown layout tokens make the validity round-trip fail exactly
#: like Go's time.Parse check (exprterpreter.go:225-229)
_GO_LAYOUT_MAP = [
    ("2006", "%Y"), ("01", "%m"), ("02", "%d"),
    ("15", "%H"), ("04", "%M"), ("05", "%S"), ("Z07:00", "%z"),
]


def _go_layout_to_strftime(layout: str) -> str:
    out = layout
    for go, py in _GO_LAYOUT_MAP:
        out = out.replace(go, py)
    if "%" not in out:
        raise ExprError(f"invalid time format: {layout}")
    return out


def interpret_cmd(cmd: EncodedCmd, rng=None, now: datetime | None = None) -> str:
    """InterpretCmd (exprterpreter.go:139-152). ``rng(lo, hi)`` supplies
    the random draw (inclusive); ``now`` pins the clock."""
    if cmd.token == TOKEN_PARAM:
        return cmd.arg_value
    if cmd.token == TOKEN_RANDOM:
        return _handle_random(cmd.args, rng, now)
    if cmd.token == TOKEN_TIME:
        return _handle_time(cmd.args, rng, now)
    if cmd.token == TOKEN_URL:
        return "*"
    raise ExprError(f"unknown command token: {cmd.token}")


def _handle_random(args: list[EncodedCmd], rng, now) -> str:
    """handleRandomCommand (exprterpreter.go:155-198)."""
    if len(args) != 2:
        raise ExprError(f"random command expects 2 arguments, got {len(args)}")
    lo_s = interpret_cmd(args[0], rng, now)
    hi_s = interpret_cmd(args[1], rng, now)
    try:
        lo = int(lo_s)
    except ValueError:
        raise ExprError(f"invalid min argument for random: {lo_s}") from None
    try:
        hi = int(hi_s)
    except ValueError:
        raise ExprError(f"invalid max argument for random: {hi_s}") from None
    if lo >= hi:
        raise ExprError("min argument must be less than max argument for random")
    if rng is None:
        import random as _random

        return str(_random.randint(lo, hi))
    return str(int(rng(lo, hi)))


def _handle_time(args: list[EncodedCmd], rng, now) -> str:
    """handleTimeCommand (exprterpreter.go:200-232)."""
    if not args:
        raise ExprError("time command expects 1 argument, got 0")
    t = now if now is not None else datetime.now(timezone.utc)
    # interpret args[0] ONCE — a nested random() inside time() must not
    # be drawn twice (once for the token check, once for the layout)
    raw = interpret_cmd(args[0], rng, now).strip()
    fmt = raw.lower()
    if fmt == "unix":
        return str(int(t.timestamp()))
    if fmt == "unixnano":
        return str(int(t.timestamp() * 1_000_000_000))
    if fmt == "rfc3339":
        # Go time.RFC3339 prints the offset with a colon and UTC as 'Z'
        # (never '+0000'); isoformat gives '+00:00', which we collapse
        # to 'Z' to match time.Time.Format exactly.
        s = t.strftime("%Y-%m-%dT%H:%M:%S") + (t.strftime("%z") or "Z")
        if s.endswith("+0000") or s.endswith("-0000"):
            return s[:-5] + "Z"
        if len(s) >= 5 and (s[-5] in "+-") and ":" not in s[-5:]:
            return s[:-2] + ":" + s[-2:]
        return s
    if fmt == "now":
        return str(t)
    # custom layout: validate+translate (Go validates via time.Parse)
    return t.strftime(_go_layout_to_strftime(raw))


def evaluate(expr: str, rng=None, now: datetime | None = None) -> str:
    """Parse + interpret in one call."""
    return interpret_cmd(parse_cmd(expr), rng=rng, now=now)


def get_float(expr: str, rng=None, now: datetime | None = None) -> float:
    """GetFloat (exprterpreter.go:247-262): numbers pass through;
    commands evaluate; ANY failure falls back to 1.0 (Go's contract)."""
    s = expr.strip()
    try:
        return float(s)
    except ValueError:
        pass
    try:
        return float(evaluate(s, rng=rng, now=now))
    except (ExprError, ValueError):
        return 1.0


def get_int(expr: str, rng=None, now: datetime | None = None) -> int:
    """GetInt: the integer twin (exprterpreter.go:264+)."""
    return int(get_float(expr, rng=rng, now=now))
