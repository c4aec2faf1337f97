"""Information-seed claim vs the reference's own lifecycle goldens.

Seed rows and every expected value are transcribed from
/root/reference/pkg/database/information_seed_db_test.go:143-222
(TestClaimInformationSeedsSQLiteFiltersByPriority /
...LifecycleEligibility) — data, not code. The fixed `now` replaces
the Go test's time.Now().
"""

from __future__ import annotations

import pytest

from thecrowler_spark.operators.infoseed import (
    claim_information_seeds,
    merge_claimed_seeds,
)

NOW = "2026-03-01 12:00:00"
SCHEMA = (
    "information_seed_id long, information_seed string, status string, "
    "priority string, engine string, disabled boolean, attempts int, "
    "created_at timestamp, last_processed_at timestamp, last_error_at timestamp"
)


def _seeds(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ts(v):
    from datetime import datetime

    return datetime.fromisoformat(v) if isinstance(v, str) else v


def _row(sid, text, status, priority="", engine="", disabled=False, attempts=0,
         created="2026-01-01 00:00:00", lpa=None, lea=None):
    return (sid, text, status, priority, engine, disabled, attempts,
            _ts(created), _ts(lpa), _ts(lea))


def test_priority_filter_and_creation_order(spark):
    # db_test.go:143-182: " high " trims, claims high seeds in
    # created_at order with the UPDATE applied; low seed untouched,
    # then claimable by the unfiltered pass.
    seeds = _seeds(spark, [
        _row(1, "low seed", "new", "low", created="2026-01-01 00:00:00"),
        _row(2, "high seed", "new", "high", created="2026-01-02 00:00:00"),
        _row(3, "next high seed", "new", "high", created="2026-01-03 00:00:00"),
    ])
    claimed = claim_information_seeds(
        seeds, 10, "test-engine", NOW, priority=" high ").collect()
    assert [r["information_seed_id"] for r in claimed] == [2, 3]
    for r in claimed:
        assert r["priority"] == "high" and r["status"] == "processing"
        assert r["engine"] == "test-engine"
        assert r["last_processed_at"] is not None and r["attempts"] == 1

    merged = merge_claimed_seeds(
        seeds, claim_information_seeds(seeds, 10, "test-engine", NOW, priority="high")
    )
    low = merged.filter("information_seed_id = 1").first()
    assert low["status"] == "new" and low["engine"] == "" and low["attempts"] == 0
    second = claim_information_seeds(merged, 10, "fallback-engine", NOW).collect()
    assert [(r["information_seed_id"], r["priority"]) for r in second] == [(1, "low")]


def test_lifecycle_eligibility_and_attempts(spark):
    # db_test.go:183-222 with processing_timeout=retry_after=1h:
    # new/pending claim; disabled never; fresh processing/error wait;
    # stale processing + old error re-claim with attempts bumped.
    seeds = _seeds(spark, [
        _row(1, "new seed", "new"),
        _row(2, "pending seed", "pending", created="2026-01-02 00:00:00"),
        _row(3, "disabled seed", "new", disabled=True),
        _row(4, "disabled pending seed", "pending", disabled=True),
        _row(5, "fresh processing seed", "processing", engine="previous-engine",
             attempts=2, created="2026-01-05 00:00:00", lpa="2026-03-01 11:50:00"),
        _row(6, "stale processing seed", "processing", attempts=3,
             created="2026-01-06 00:00:00", lpa="2026-03-01 10:00:00"),
        _row(7, "fresh error seed", "error", attempts=4,
             created="2026-01-07 00:00:00", lea="2026-03-01 11:50:00"),
        _row(8, "old error seed", "error", attempts=5,
             created="2026-01-08 00:00:00", lea="2026-03-01 10:00:00"),
    ])
    claimed = claim_information_seeds(
        seeds, 10, "eligibility-engine", NOW,
        processing_timeout="1 hour", retry_after="1 hour",
    ).collect()
    assert [r["information_seed_id"] for r in claimed] == [1, 2, 6, 8]
    got = {r["information_seed_id"]: r for r in claimed}
    assert {k: v["attempts"] for k, v in got.items()} == {1: 1, 2: 1, 6: 4, 8: 6}
    for r in claimed:
        assert r["status"] == "processing" and r["engine"] == "eligibility-engine"

    merged = merge_claimed_seeds(seeds, claim_information_seeds(
        seeds, 10, "eligibility-engine", NOW,
        processing_timeout="1 hour", retry_after="1 hour"))
    rows = {r["information_seed_id"]: r for r in merged.collect()}
    assert merged.count() == 8
    for sid, status, engine, attempts in [
        (3, "new", "", 0), (4, "pending", "", 0),
        (5, "processing", "previous-engine", 2), (7, "error", "", 4),
    ]:
        r = rows[sid]
        assert (r["status"], r["engine"], r["attempts"]) == (status, engine, attempts)


def test_null_timestamps_reclaim_and_fifo_limit(spark):
    # claims.go:165-166: processing/error with NULL timestamps are
    # immediately eligible; LIMIT takes the FIFO prefix.
    seeds = _seeds(spark, [
        _row(1, "s1", "processing", created="2026-01-03 00:00:00"),
        _row(2, "s2", "error", created="2026-01-01 00:00:00"),
        _row(3, "s3", "new", created="2026-01-02 00:00:00"),
        _row(4, "s4", " Pending ", created="2026-01-04 00:00:00"),  # trim+lower
    ])
    claimed = claim_information_seeds(seeds, 3, "e", NOW).collect()
    assert [r["information_seed_id"] for r in claimed] == [2, 3, 1]


def test_limit_zero_and_blank_engine(spark):
    seeds = _seeds(spark, [_row(1, "s", "new")])
    assert claim_information_seeds(seeds, 0, "e", NOW).count() == 0
    with pytest.raises(ValueError):
        claim_information_seeds(seeds, 5, "   ", NOW)


def test_engine_sharding_is_disjoint_and_complete(spark):
    seeds = _seeds(spark, [
        _row(i, f"seed-{i}", "new", created=f"2026-01-{1 + i % 27:02d} 00:00:00")
        for i in range(1, 41)
    ])
    parts = [
        {r["information_seed_id"] for r in claim_information_seeds(
            seeds, 100, "e", NOW, engine_id=e, n_engines=4).collect()}
        for e in range(4)
    ]
    assert sum(len(p) for p in parts) == 40
    assert set().union(*parts) == set(range(1, 41))
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (parts[a] & parts[b])
