"""Incremental time-series aggregation ≡ full recompute
(time_series_aggregation.go:100-249 checkpoint − overlap semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.timeseries import (
    bucket_aggregates,
    incremental_bucket_aggregates,
)
from thecrowler_spark.sources.lake import LakeTable


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, m, ts, float(v)) for i, (m, ts, v) in enumerate(rows)],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_full_recompute(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "agg"))
    base = [
        ("cpu", f"2026-01-01 {h:02d}:{mi:02d}:00", 10 * h + mi)
        for h in range(0, 8)
        for mi in (5, 35)
    ]
    ev1 = _events(spark, base)

    # run 1: no checkpoint → full history, checkpoint = now1
    incremental_bucket_aggregates(ev1, table, now="2026-01-01 08:00:00", decimal_scale=2)
    want1 = bucket_aggregates(
        ev1.filter(F.col("ts") < F.lit("2026-01-01 08:00:00").cast("timestamp")),
        decimal_scale=2,
    )
    assert _canon(table.read()) == _canon(want1)
    assert table.current_meta()["checkpoint"] == "2026-01-01 08:00:00"

    # run 2: append LATE events inside the overlap (hour 7, already
    # published) plus new hours 8-9 → incremental replace must equal a
    # full recompute over everything
    late_and_new = base + [
        ("cpu", "2026-01-01 07:50:00", 999),          # late, inside overlap
        ("cpu", "2026-01-01 08:10:00", 81),
        ("cpu", "2026-01-01 09:20:00", 92),
        ("mem", "2026-01-01 08:40:00", 7),            # new metric appears
    ]
    ev2 = _events(spark, late_and_new)
    incremental_bucket_aggregates(ev2, table, now="2026-01-01 10:00:00", decimal_scale=2)
    want2 = bucket_aggregates(
        ev2.filter(F.col("ts") < F.lit("2026-01-01 10:00:00").cast("timestamp")),
        decimal_scale=2,
    )
    assert _canon(table.read()) == _canon(want2)

    # run 3: nothing new → stable (idempotent replacement of the
    # overlap window only)
    incremental_bucket_aggregates(ev2, table, now="2026-01-01 11:00:00", decimal_scale=2)
    assert _canon(table.read()) == _canon(want2)
    # snapshot history = one commit per run (time travel intact)
    assert len(table.snapshots()) == 3


def test_incremental_skips_untouched_history(spark, tmp_path):
    """The second run must NOT recompute pre-overlap buckets: corrupt an
    old bucket row in the table and verify it survives verbatim (proof
    the run's cost is O(recent), not O(history))."""
    table = LakeTable(spark, str(tmp_path / "agg"))
    base = [("cpu", f"2026-01-01 {h:02d}:15:00", h) for h in range(0, 6)]
    ev = _events(spark, base)
    incremental_bucket_aggregates(ev, table, now="2026-01-01 06:00:00", decimal_scale=2)

    # tamper with an ancient bucket (hour 0): set value_sum to a marker
    cur = table.read()
    tampered = cur.withColumn(
        "value_sum",
        F.when(
            F.col("bucket_start") == F.lit("2026-01-01 00:00:00").cast("timestamp"),
            F.lit(12345.0),
        ).otherwise(F.col("value_sum")),
    )
    table.write(tampered, meta=table.current_meta())

    ev2 = _events(spark, base + [("cpu", "2026-01-01 06:30:00", 60)])
    incremental_bucket_aggregates(ev2, table, now="2026-01-01 07:00:00", decimal_scale=2)
    got = {
        r["bucket_start"].isoformat(): r["value_sum"] for r in table.read().collect()
    }
    assert got["2026-01-01T00:00:00"] == 12345.0  # untouched: outside overlap
    assert got["2026-01-01T06:30:00" [:13] + ":00:00"] == 60.0  # new bucket present
