"""Time-series bucket aggregation (A4).

Reference: RunTimeSeriesAggregation
(/root/reference/pkg/database/time_series_aggregation.go:81-334) —
tumbling buckets per metric with count/sum/min/max/avg, exact
percentiles (nearest-rank :334-349 / continuous), first/last edge
values and change counts
(columns: /root/reference/pkg/database/postgresql-setup.pgsql:2229-2283).

Spark rendering: ``groupBy(metric, window(ts, bucket))`` — partial
aggregation map-side for free; exact ``percentile`` (not approx) to
match the reference's exactness.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # import cycle guard (sources ↔ operators)
    from ..sources.lake import LakeTable


def bucket_aggregates(
    events: DataFrame,
    ts_col: str = "ts",
    metric_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
    decimal_scale: int | None = None,
) -> DataFrame:
    """Tumbling-bucket aggregate table, one row per (metric, bucket).

    ``change_count`` = number of consecutive observations (bucket-local
    time order, event_id tie-break) whose value differs from the
    previous one (time_series_aggregation.go:309-333 change tracking).
    The lag window shares the (metric, bucket) partitioning with the
    groupBy, so AQE plans ONE shuffle for both.

    ``decimal_scale``: when the metric is fixed-point (e.g. 2-decimal
    money), sum/avg are computed on scaled integers — exact and
    independent of partition/accumulation order, so re-runs, different
    cluster sizes, and external oracles all produce bit-identical
    aggregates (distributed-determinism requirement; float summation
    order otherwise varies with partitioning).

    Plan shape (r6 optimization, guide §2.4): the bucket struct is
    materialized ONCE as a column so the lag window's partitioning
    (metric, bucket) is the SAME attribute pair the groupBy clusters on
    — one Exchange serves both (previously the groupBy re-derived the
    window expression and paid a second+third Exchange). The five exact
    percentiles are ONE ``percentile(value, array(...))`` buffer instead
    of five independent per-group value buffers, and ``distinct_values``
    is ``size(collect_set(value + 0.0))`` instead of ``count(DISTINCT
    value)`` — the distinct-aggregate rewrite otherwise keys the whole
    partial aggregation (all percentile buffers included) on (metric,
    bucket, value) and adds an extra Exchange. ``+ 0.0`` normalizes
    ``-0.0`` to ``0.0`` (count_distinct's normalizenanandzero); Java
    set semantics already collapse NaNs to one, matching count_distinct.
    """
    events = events.withColumn("_w", F.window(F.col(ts_col), bucket))
    lag_w = Window.partitionBy(F.col(metric_col), F.col("_w")).orderBy(
        F.col(ts_col), F.col("event_id")
    )
    events = events.withColumn(
        "_changed",
        (F.col(value_col) != F.lag(value_col).over(lag_w)).cast("int"),
    )
    if decimal_scale is not None:
        mult = float(10**decimal_scale)
        cents = F.round(F.col(value_col) * mult).cast("long")
        sum_expr = F.round(F.sum(cents).cast("double") / mult, 4)
        # the 4-decimal MEAN is rounded in EXACT INTEGER arithmetic:
        # round-half-up(a/b) = (2a + b) DIV (2b), all in int64 — dividing
        # the scaled-int sum as a double first puts results on .00005
        # boundaries where Spark (HALF_UP) and other engines (HALF_EVEN)
        # disagree in the last digit (hit at sf0.1; non-negative sums
        # assumed). The DIV lands in a post-agg select so it runs as true
        # integer division (no double round-trip past 2^53).
        up = 10 ** (4 - decimal_scale)
        avg_expr = F.sum(cents) * (2 * up) + F.count("*")  # numerator; ÷(2n) below
    else:
        sum_expr = F.round(F.sum(value_col), 4)
        avg_expr = F.round(F.avg(value_col), 4)
    pct = F.percentile(
        F.col(value_col),
        F.array(F.lit(0.5), F.lit(0.75), F.lit(0.9), F.lit(0.95), F.lit(0.99)),
    )
    agged = (
        events.groupBy(F.col(metric_col).alias("metric"), F.col("_w").alias("w"))
        .agg(
            F.count("*").alias("value_count"),
            sum_expr.alias("value_sum"),
            F.round(F.min(value_col), 4).alias("value_min"),
            F.round(F.max(value_col), 4).alias("value_max"),
            avg_expr.alias("value_avg"),
            pct.alias("_pcts"),
            # deterministic first/last: tie-break timestamps on event_id
            F.round(
                F.min_by(value_col, F.struct(ts_col, "event_id")), 4
            ).alias("first_value"),
            F.round(
                F.max_by(value_col, F.struct(ts_col, "event_id")), 4
            ).alias("last_value"),
            F.size(F.collect_set(F.col(value_col) + F.lit(0.0)))
            .cast("long")
            .alias("distinct_values"),
            F.coalesce(F.sum("_changed"), F.lit(0)).cast("long").alias("change_count"),
        )
    )
    if decimal_scale is not None:
        agged = agged.withColumn(
            "value_avg",
            F.expr("CAST(value_avg DIV (value_count * 2) AS DOUBLE) / 10000.0"),
        )
    return (
        agged
        .select(
            "metric",
            F.col("w.start").alias("bucket_start"),
            "value_count",
            "value_sum",
            "value_min",
            "value_max",
            "value_avg",
            F.round(F.col("_pcts")[0], 4).alias("p50"),
            F.round(F.col("_pcts")[1], 4).alias("p75"),
            F.round(F.col("_pcts")[2], 4).alias("p90"),
            F.round(F.col("_pcts")[3], 4).alias("p95"),
            F.round(F.col("_pcts")[4], 4).alias("p99"),
            "first_value",
            "last_value",
            "distinct_values",
            "change_count",
        )
    )


def incremental_bucket_aggregates(
    events: DataFrame,
    table: "LakeTable",
    now: str,
    overlap: str = "1 hour",
    ts_col: str = "ts",
    metric_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
    decimal_scale: int | None = None,
) -> int:
    """Checkpointed incremental aggregation over a LakeTable of buckets.

    Reference: ``RunTimeSeriesAggregation``
    (/root/reference/pkg/database/time_series_aggregation.go:100-249):
    recompute ONLY the buckets intersecting ``[checkpoint − overlap,
    now)`` — delayed observations inside the overlap update their
    (already-published) buckets — then transactionally DELETE the
    affected bucket range and insert the recomputed rows (the
    serializable-tx replacement, :210-240). Here the transaction is one
    LakeTable snapshot commit (kept ∪ recomputed, atomic pointer swap);
    the new checkpoint (= now) rides in the snapshot meta
    (``recordTimeSeriesAggregationRun`` analog, :238).

    Per-run cost is O(events since checkpoint − overlap), not O(all
    history) — at 100 TB of events the full recompute is the thing
    that stops fitting in a nightly window. First run (no checkpoint)
    aggregates from the earliest observation. Returns the snapshot id.
    """
    from ..functions.intervals import parse_interval_seconds_py

    now_ts = F.lit(now).cast("timestamp")
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")).filter(
        F.col(ts_col) < now_ts
    )
    checkpoint = table.current_meta().get("checkpoint")
    if checkpoint is None:
        fresh = ev
    else:
        start = F.lit(checkpoint).cast("timestamp") - F.expr(
            f"INTERVAL {parse_interval_seconds_py(overlap)} SECOND"
        )
        # a bucket is affected iff it INTERSECTS (start, now): its end is
        # past start (delete predicate bucket_end > Start, :221) — keep
        # every event of an affected bucket so partial buckets recompute
        # whole, not just their tail
        fresh = ev.filter(F.window(F.col(ts_col), bucket).end > start)
    recomputed = bucket_aggregates(
        fresh,
        ts_col=ts_col,
        metric_col=metric_col,
        value_col=value_col,
        bucket=bucket,
        decimal_scale=decimal_scale,
    )
    if table.current_snapshot() is None:
        return table.write(recomputed, meta={"checkpoint": now})
    prev = table.read()
    if checkpoint is None:
        kept = prev.limit(0)
    else:
        start = F.lit(checkpoint).cast("timestamp") - F.expr(
            f"INTERVAL {parse_interval_seconds_py(overlap)} SECOND"
        )
        affected = (F.col("bucket_start") + F.expr(f"INTERVAL {bucket}") > start) & (
            F.col("bucket_start") < now_ts
        )
        kept = prev.filter(~affected)
    return table.write(kept.unionByName(recomputed), meta={"checkpoint": now})
