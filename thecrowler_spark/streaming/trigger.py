"""Streaming crawl trigger — the poll loop as Structured Streaming.

Reference: the engine polls the frontier every ``query_timer`` seconds
(/root/reference/cmd/thecrowler/main.go:305-349, default 5 s
pkg/config/config.go:210) and dispatches a batch of claimed sources.
Spark rendering: a rate source ticking at the poll cadence drives
``foreachBatch``; each micro-batch claims the next eligible sources
(deterministic multi-engine partitioning, see
:func:`..operators.frontier.claim_sources`) and runs one crawl through
the same engine the batch path uses — identical semantics, backed by
streaming checkpoints for the trigger state.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def crawl_trigger_stream(
    spark: SparkSession,
    poll_seconds: int,
    on_tick: Callable[[int], None],
    checkpoint_dir: str | None = None,
):
    """Start a rate-source stream that calls ``on_tick(batch_id)`` once
    per poll interval (the checkSources loop analog). Returns the
    StreamingQuery; caller stops it.

    ``on_tick`` typically: claim sources → ``CrawlEngine.run`` →
    MERGE results. The rate source carries no data — it IS the timer,
    so trigger state/restart semantics come from Structured Streaming
    checkpointing instead of a hand-rolled loop.
    """
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(F.col("timestamp"))
    )

    def _batch(df: DataFrame, batch_id: int) -> None:
        # rate batches can be empty on the first trigger; tick regardless
        on_tick(batch_id)

    writer = (
        ticks.writeStream.foreachBatch(_batch)
        .trigger(processingTime=f"{poll_seconds} seconds")
        .outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
