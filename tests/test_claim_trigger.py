"""Multi-engine claim disjointness + streaming poll trigger."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from thecrowler_spark.operators.frontier import claim_sources
from thecrowler_spark.streaming.trigger import crawl_trigger_stream


def _seeds(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("source_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("source_uid"),
        F.concat(F.lit("https://h"), F.col("id").cast("string"), F.lit(".example.com")).alias("url"),
        F.lit("high").alias("priority"),
        F.lit("new").alias("status"),
        F.lit(2).cast("int").alias("restricted"),
        F.lit(False).alias("disabled"),
        F.lit(0).cast("int").alias("flags"),
        F.lit("{}").alias("config"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("created_at"),
    )


def test_multi_engine_claims_are_disjoint_and_exhaustive(spark):
    seeds = _seeds(spark)
    n_engines = 4
    claimed = [
        {r["source_id"] for r in claim_sources(seeds, 1000, engine_id=e, n_engines=n_engines).collect()}
        for e in range(n_engines)
    ]
    allids = set().union(*claimed)
    assert allids == set(range(200))  # exhaustive: every source owned
    for i in range(n_engines):
        for j in range(i + 1, n_engines):
            assert not (claimed[i] & claimed[j])  # disjoint: SKIP LOCKED analog
    # stable across retries (deterministic ownership)
    again = {r["source_id"] for r in claim_sources(seeds, 1000, engine_id=0, n_engines=4).collect()}
    assert again == claimed[0]


def test_crawl_trigger_ticks(spark, tmp_path):
    ticks: list[int] = []
    q = crawl_trigger_stream(
        spark, poll_seconds=1, on_tick=ticks.append, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        deadline = time.time() + 30
        while len(ticks) < 2 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(ticks) >= 2  # the poll loop fired repeatedly
    assert ticks == sorted(ticks)
