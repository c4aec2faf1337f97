"""Goldens for the interval parser + seeded pacing (crawler.go:541-644,
exprterpreter random(x,y))."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.functions.intervals import parse_interval_seconds, pacing_delay_seconds

CASES = [
    # (input, expected_seconds) — clamp subtracts 1s whenever result > 1s
    ("", 1200),              # empty → 20m, UNclamped (crawler.go:545-547)
    ("15 minutes", 899),     # 900 − 1
    ("1 min", 59),
    ("45s", 44),
    ("2 hours", 7199),
    ("3 days", 259199),      # 259200 > 86400? NO: clamp to 86400 first → 86399
    ("1s", 1),               # not > 1s → no −1
    ("0s", 30),              # <1s → 30s → then −1? 30 > 1 → 29
    ("1h30m", 5399),         # compound ParseDuration path
    ("garbage", 1199),       # invalid → 20m → clamped −1
    ("25h", 86399),          # >24h → 24h → −1
]
# fix expectations where clamping order matters:
EXPECT = dict(CASES)
EXPECT["3 days"] = 86399   # 259200 → clamp 24h → 86400 − 1
EXPECT["0s"] = 29          # → 30 → 30 > 1 → 29


def test_parse_interval_goldens(spark):
    df = spark.createDataFrame([(k,) for k, _ in CASES], "v string")
    got = {
        r["v"]: r["secs"]
        for r in df.select("v", parse_interval_seconds("v").alias("secs")).collect()
    }
    for k, _ in CASES:
        assert got[k] == EXPECT[k], f"{k!r}: {got[k]} != {EXPECT[k]}"


def test_pacing_delay_reproducible_and_bounded(spark):
    df = spark.createDataFrame(
        [(f"https://h{i}.example.com/p{i}",) for i in range(500)], "url string"
    )
    d1 = df.select("url", pacing_delay_seconds("url", 1, 3).alias("d")).collect()
    d2 = df.select("url", pacing_delay_seconds("url", 1, 3).alias("d")).collect()
    assert [r["d"] for r in d1] == [r["d"] for r in d2]  # seed-pinned replay
    # min effective sleep 3s (web.go:1312-1321); random(1,3) → all exactly 3
    assert all(r["d"] == 3.0 for r in d1)
    d5 = df.select(pacing_delay_seconds("url", 4, 6).alias("d")).collect()
    vals = [r["d"] for r in d5]
    assert all(4.0 <= v < 6.0 for v in vals)
    assert len(set(vals)) > 100  # actually varies per url


def test_budgets_from_intervals(spark):
    from thecrowler_spark.operators.politeness import budgets_from_intervals

    hosts = spark.createDataFrame(
        [("a.example.com", 2), ("b.example.com", 5), ("c.example.com", 120)],
        "host string, interval_seconds int",
    )
    got = {
        r["host"]: r["max_fetches_per_round"]
        for r in budgets_from_intervals(hosts, round_duration_s=60.0).collect()
    }
    # interval 2 → clamped to 3s min → floor(60/3)=20; 5 → 12; 120 → min budget 1
    assert got == {"a.example.com": 20, "b.example.com": 12, "c.example.com": 1}


def test_parse_pacing_expr():
    from thecrowler_spark.functions.intervals import parse_pacing_expr

    assert parse_pacing_expr("2") == (2.0, 2.0)
    assert parse_pacing_expr("random(1, 3)") == (1.0, 3.0)
    assert parse_pacing_expr("RANDOM(3,1)") == (1.0, 3.0)
    assert parse_pacing_expr("") == (0.0, 0.0)
    assert parse_pacing_expr("garbage") == (0.0, 0.0)


def test_scalar_parser_matches_column_parser(spark):
    """parse_interval_seconds_py (driver-side scalar) must equal the
    Column version on the golden battery + extra grammar corners."""
    from thecrowler_spark.functions.intervals import parse_interval_seconds_py

    extra = ["1 day", "12 hours", "6 hours", "15 minutes", "2w", "1mo",
             "90 secs", "0h0m5s", "  10 MIN  ", "7", "1h", "24h"]
    battery = [k for k, _ in CASES] + extra
    df = spark.createDataFrame([(v,) for v in battery], "v string")
    col_vals = {
        r["v"]: r["secs"]
        for r in df.select("v", parse_interval_seconds("v").alias("secs")).collect()
    }
    for v in battery:
        assert parse_interval_seconds_py(v) == col_vals[v], v
    # the claim-eligibility cutoffs pinned in __spark_entry__'s oracle SQL
    assert parse_interval_seconds_py("12 hours") == 43199
    assert parse_interval_seconds_py("6 hours") == 21599
    assert parse_interval_seconds_py("15 minutes") == 899
    assert parse_interval_seconds_py("1 day") == 86399
