"""Adaptive revisit scheduling: hand-computed Cho & Garcia-Molina
estimates, branch coverage (explore / never-changes / clamps), and the
bounded-window plan shape."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from thecrowler_spark.operators.revisit import revisit_schedule

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z (session tz is UTC)


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, 0) + timedelta(seconds=s)


def _snaps(spark, rows):
    return spark.createDataFrame(rows, "source_id string, ts timestamp, content_hash string")


def _sched(spark, rows, **kw):
    out = revisit_schedule(_snaps(spark, rows), **kw).collect()
    return {r["source_id"]: r.asDict() for r in out}


def test_hand_computed_rate_and_interval(spark):
    # 5 obs, 100 s apart, hashes a b a b b -> 3 changes over 4 pairs
    rows = [("A", _ts(i * 100), h) for i, h in enumerate("ababb")]
    got = _sched(spark, rows, min_interval_s=60, max_interval_s=10_000)["A"]
    assert got["n_obs"] == 5 and got["n_changes"] == 3
    assert got["avg_interval_s"] == 100
    rate = math.floor(-math.log((2 * (4 - 3) + 1) / (2 * 4 + 1)) * 1e6 + 0.5)
    assert got["rate_micro"] == rate
    want = (100 * 1_000_000) // rate  # = 91: expect ~1 change per visit
    assert got["next_interval_s"] == want
    assert got["next_crawl_epoch_s"] == _EPOCH_2024 + 400 + want


def test_never_changes_gets_max_and_single_obs_gets_min(spark):
    rows = [("B", _ts(i * 50), "same") for i in range(3)] + [("C", _ts(7), "x")]
    got = _sched(spark, rows, min_interval_s=120, max_interval_s=3600)
    assert got["B"]["n_changes"] == 0 and got["B"]["rate_micro"] == 0
    assert got["B"]["next_interval_s"] == 3600  # never observed changing
    assert got["C"]["n_obs"] == 1 and got["C"]["next_interval_s"] == 120  # explore

def test_every_pair_changes_clamps_to_min(spark):
    # change every 10 s, min interval 60 s -> raw 1/rate < spacing,
    # clamped up to the politeness floor
    rows = [("D", _ts(i * 10), f"h{i}") for i in range(6)]
    got = _sched(spark, rows, min_interval_s=60, max_interval_s=3600)["D"]
    assert got["n_changes"] == 5
    assert got["next_interval_s"] == 60


def test_validation(spark):
    with pytest.raises(ValueError):
        revisit_schedule(_snaps(spark, []), min_interval_s=0)
    with pytest.raises(ValueError):
        revisit_schedule(_snaps(spark, []), min_interval_s=100, max_interval_s=50)


def test_adaptive_schedule_gates_completed_claims(spark):
    """claim_sources(schedule=...): a completed source comes back when
    NOW reaches its adaptive next_crawl_epoch_s — ahead of (or instead
    of) the fixed regular_crawling interval."""
    from thecrowler_spark.operators.frontier import claim_sources

    seeds = spark.createDataFrame(
        [
            (i, "completed" if i < 3 else "new", datetime(2020, 1, 2, 12, 0),
             False, "high", datetime(2019, 1, i), f"https://h{i}.example.com")
            for i in (1, 2, 3)
        ],
        "source_id long, status string, last_updated_at timestamp,"
        " disabled boolean, priority string, created_at timestamp, url string",
    )
    now = "2020-01-02 13:00:00"
    now_epoch = 1577970000  # 2020-01-02T13:00:00Z
    schedule = spark.createDataFrame(
        [(1, now_epoch - 10), (2, now_epoch + 10)],
        "source_id long, next_crawl_epoch_s long",
    )
    base = {r["source_id"] for r in claim_sources(seeds, 10, now=now).collect()}
    assert base == {3}  # no interval gate, no schedule: only the new source
    got = {
        r["source_id"]
        for r in claim_sources(seeds, 10, now=now, schedule=schedule).collect()
    }
    assert got == {1, 3}  # 1 adaptively due, 2 not for another 10 s
    with pytest.raises(ValueError):
        claim_sources(seeds, 10, schedule=schedule)  # schedule requires now


def test_plan_bounded_window_one_groupby(spark):
    """The lag window partitions on source_id (bounded per-source
    history), never an empty spec; aggregation is partial (no second
    full-stream shuffle); nothing cartesian."""
    rows = [("A", _ts(i), f"h{i % 2}") for i in range(4)]
    plan = (
        revisit_schedule(_snaps(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(source_id#" in plan
    # an empty partition spec would render as windowspecdefinition(ts#...
    assert "partial_count" in plan or "HashAggregate" in plan
