"""Temporal joins: as-of tie/miss semantics, interval containment."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from thecrowler_spark.operators import temporal as TP

D = dt.datetime


def test_asof_tie_and_miss_semantics(spark):
    versions = spark.createDataFrame(
        [(1, D(2024, 1, 2), "v1"), (1, D(2024, 1, 4), "v2"), (2, D(2024, 1, 9), "w1")],
        "key long, ts timestamp_ntz, state string",
    )
    probe = spark.createDataFrame(
        [
            (1, 10, D(2024, 1, 1)),   # before any version -> NULL
            (1, 11, D(2024, 1, 2)),   # tie -> v1 (at-or-before)
            (1, 12, D(2024, 1, 3)),   # between -> v1
            (1, 13, D(2024, 1, 4)),   # tie -> v2
            (1, 14, D(2024, 1, 9)),   # after last -> v2
            (2, 20, D(2024, 1, 8)),   # other key, before -> NULL
            (3, 30, D(2024, 1, 8)),   # key with no versions -> NULL
        ],
        "key long, event_id long, ts timestamp_ntz",
    )
    got = {
        r.event_id: r.state
        for r in TP.asof_join(probe, versions, ["key"], "ts", ["state"]).collect()
    }
    assert got == {10: None, 11: "v1", 12: "v1", 13: "v2", 14: "v2", 20: None, 30: None}


def test_asof_bucketed_matches_base_and_carries_across_empty_buckets(spark):
    """asof_join_bucketed ≡ asof_join, incl. probes in buckets with no
    version rows (carry-in from a much earlier bucket) and the same
    tie/miss goldens."""
    versions = spark.createDataFrame(
        [(1, D(2024, 1, 2), "v1"), (1, D(2024, 1, 4), "v2"), (2, D(2024, 1, 9), "w1")],
        "key long, ts timestamp_ntz, state string",
    )
    probe = spark.createDataFrame(
        [
            (1, 10, D(2024, 1, 1)),
            (1, 11, D(2024, 1, 2)),    # tie with version in same bucket
            (1, 12, D(2024, 1, 3)),
            (1, 13, D(2024, 1, 4)),
            (1, 14, D(2024, 1, 9)),    # empty buckets between Jan 4 and 9
            (1, 15, D(2024, 3, 20)),   # months of empty buckets
            (2, 20, D(2024, 1, 8)),
            (3, 30, D(2024, 1, 8)),
        ],
        "key long, event_id long, ts timestamp_ntz",
    )
    want = {
        r.event_id: r.state
        for r in TP.asof_join(probe, versions, ["key"], "ts", ["state"]).collect()
    }
    got = {
        r.event_id: r.state
        for r in TP.asof_join_bucketed(
            probe, versions, ["key"], "ts", ["state"], bucket="1 day"
        ).collect()
    }
    assert got == want
    assert got[15] == "v2" and got[10] is None and got[11] == "v1"
    # the merge window really is (key, bucket)-partitioned
    plan = (
        TP.asof_join_bucketed(probe, versions, ["key"], "ts", ["state"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(key" in plan and "_bkt" in plan


def test_interval_join_containment(spark):
    hist = spark.createDataFrame(
        [(1, "a", D(2024, 1, 1), D(2024, 1, 3)), (1, "b", D(2024, 1, 3), None)],
        "key long, state string, valid_from timestamp_ntz, valid_to timestamp_ntz",
    )
    probe = spark.createDataFrame(
        [
            (1, D(2024, 1, 1)),        # start boundary -> a
            (1, D(2024, 1, 2, 23)),    # inside -> a
            (1, D(2024, 1, 3)),        # boundary: [from, to) -> b, not a
            (1, D(2024, 1, 30)),       # open interval -> b
            (2, D(2024, 1, 2)),        # no history key -> dropped (inner)
        ],
        "key long, ts timestamp_ntz",
    )
    rows = TP.interval_join(probe, hist, ["key"]).select("ts", "state").collect()
    got = sorted((r.ts, r.state) for r in rows)
    assert got == [
        (D(2024, 1, 1), "a"),
        (D(2024, 1, 2, 23), "a"),
        (D(2024, 1, 3), "b"),
        (D(2024, 1, 30), "b"),
    ]
