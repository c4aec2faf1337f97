"""SparkSession factory tuned for the crawl workload.

Local testing runs ``local[N]`` single-JVM; the same configs are what we
would ship to a 1000-executor cluster (AQE on, skew-join on, Arrow on).
Shuffle partitioning is sized per-run by the frontier loop, not here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "thecrowler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-ready defaults.

    - AQE + skew-join handling on: at 10^10-URL scale host-skew is the
      dominant failure mode (SURVEY.md §4 "Skew handling"); we salt
      explicitly *and* let AQE split what slips through.
    - Arrow on: every Python-side kernel is a vectorized pandas UDF.
    - Shuffle partitions default to 2×cores locally; on a real cluster
      AQE coalesces, so a generous initial number is safe.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)
    # AQE stays ON by default (skew safety at scale); SPARK_GRAFT_AQE=0
    # turns it off for fixed-shape rounds where the per-stage driver
    # replanning pause is measurable against the round length.
    aqe = os.environ.get("SPARK_GRAFT_AQE", "1") != "0"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # ParallelGC over G1: this is a batch-throughput engine, and G1's
        # concurrent GC threads steal 15-25% of narrow/pinned topologies
        # (measured on the crawl map stage: 2.14 s G1 vs 1.71 s ParallelGC
        # at local[8]; scaling eff 0.65 → 0.82). Same reasoning holds for
        # executor JVMs on a real cluster (spark.executor.extraJavaOptions).
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
