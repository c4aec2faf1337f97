"""Event-stream processing (Structured Streaming).

Reference: the Events table + LISTEN/NOTIFY bus and TTL
(/root/reference/pkg/database/postgresql-setup.pgsql:865-879,
cmd/thecrowler/main.go:364-392). The reference is micro-batch by
construction (poll loops, SURVEY.md §2.9); here the same semantics as a
real stream: watermark for TTL/late data, tumbling windowed counts.

``windowed_event_counts`` works on BOTH a batch and a streaming
DataFrame (identical transformation — the batch run is the oracle for
the streaming run, tested in tests/test_operators.py::test_streaming_equals_batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    On a streaming input the watermark bounds state (event TTL analog,
    pgsql:877); on a batch input the watermark is a no-op.
    """
    # TIMESTAMP_NTZ → TIMESTAMP (watermarks require tz-aware event time;
    # session TZ is UTC so the instant is unchanged)
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col("event_type"), F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # fixed-point sum (scaled-integer cents): float accumulation
            # order differs between partitions/engines; integer sums are
            # order-independent, so re-runs and oracles hash identically
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0, 4
            ).alias("value_sum"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "n_events",
            "value_sum",
        )
    )


def stream_events_from_parquet(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over the events parquet (micro-batch replay)."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
