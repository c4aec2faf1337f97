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


def test_interval_eligibility_and_stale_reclaim(spark):
    """update_sources parity (pgsql:2864-2884): interval gates per
    status + processing-timeout re-claim of a crashed engine's claims."""
    from datetime import datetime

    from thecrowler_spark.operators.frontier import mark_processing

    rows = [
        # (id, status, last_updated_at)
        (1, "processing", datetime(2020, 1, 1, 0, 0)),   # stale > 1 day → re-claim
        (2, "processing", datetime(2020, 1, 2, 12, 0)),  # claimed 1h ago → locked
        (3, "completed", datetime(2020, 1, 2, 5, 0)),    # 8h > regular_crawling 6h
        (4, "completed", datetime(2020, 1, 2, 12, 30)),  # 30min < 6h → not yet
        (5, "error", datetime(2020, 1, 2, 12, 50)),      # 10min < 15min retry → no
        (6, "error", datetime(2020, 1, 2, 12, 0)),       # 1h > 15min → retry
        (7, "new", datetime(2020, 1, 2, 12, 59)),        # always
        (8, None, None),                                  # NULL status → eligible
    ]
    seeds = spark.createDataFrame(
        [
            (i, s, lu, False, "high", datetime(2019, 1, i), f"https://h{i}.example.com")
            for i, s, lu in rows
        ],
        "source_id long, status string, last_updated_at timestamp, disabled boolean,"
        " priority string, created_at timestamp, url string",
    )
    now = "2020-01-02 13:00:00"
    got = {
        r["source_id"]
        for r in claim_sources(seeds, 100, now=now, regular_crawling="6 hours").collect()
    }
    assert got == {1, 3, 6, 7, 8}

    # kill-and-resume: mark claimed → immediately ineligible → re-claimable
    # again only after processing_timeout (86399s) elapses
    claimed = claim_sources(seeds, 100, now=now, regular_crawling="6 hours")
    marked = mark_processing(seeds, claimed, engine_id="e1", now=now)
    soon = {
        r["source_id"]
        for r in claim_sources(marked, 100, now="2020-01-02 14:00:00", regular_crawling="6 hours").collect()
    }
    # none of the freshly-marked claims re-claimed an hour later; only the
    # unclaimed error source (5) has crossed its 15-min retry gate by then
    assert soon == {5}
    later = {
        r["source_id"]
        for r in claim_sources(marked, 100, now="2020-01-03 13:00:00", regular_crawling="6 hours").collect()
    }
    # a day later every marked claim is stale-processing (timeout 86399s),
    # 2's pre-existing claim expired too, 4 crossed regular_crawling, 5 retries
    assert later == {1, 2, 3, 4, 5, 6, 7, 8}
    eng = {r["source_id"]: r["engine"] for r in marked.collect()}
    assert eng[1] == "e1" and eng[2] is None


def test_refill_watermarks():
    """Low/high-watermark refill semantics (main.go:566-715): refill only
    below low water with a free worker; top up to high water; inactivity
    closes the pipeline once and permanently."""
    from thecrowler_spark.streaming.refill import RefillController, RefillPolicy

    t = [0.0]
    clock = lambda: t[0]  # noqa: E731
    c = RefillController(RefillPolicy(capacity=8), clock=clock)
    # queue above low water (4) → no refill even with free workers
    assert c.need(queued=5, available_workers=3) == 0
    # below low water but no free worker → backpressure, no refill
    assert c.need(queued=1, available_workers=0) == 0
    # below low water + free worker → top up to high water
    assert c.need(queued=3, available_workers=2) == 5
    assert c.need(queued=0, available_workers=1) == 8

    # inactivity close: nothing new for 60s while idle
    c.record_activity(3)
    t[0] = 30.0
    assert not c.should_close(pipelines_running=False)
    t[0] = 95.0
    assert not c.should_close(pipelines_running=True)  # busy → stay open
    assert c.should_close(pipelines_running=False)
    assert c.need(queued=0, available_workers=8) == 0  # closed claims nothing
    c.record_activity(5)
    assert c.should_close()  # close is one-way (closeChanOnce analog)


def test_refill_claim_integration(spark):
    from thecrowler_spark.streaming.refill import (
        RefillController,
        RefillPolicy,
        refill_claim,
    )

    seeds = _seeds(spark, n=50)
    c = RefillController(RefillPolicy(capacity=6))
    claimed, n = refill_claim(seeds, c, queued=1, available_workers=2)
    assert n == 5 and claimed.count() == 5
    # FIFO determinism: the claim is the head of the eligible order
    ids = sorted(r["source_id"] for r in claimed.collect())
    assert ids == [0, 1, 2, 3, 4]
    none_claim, n2 = refill_claim(seeds, c, queued=6, available_workers=2)
    assert none_claim is None and n2 == 0
