"""Stateful streaming sessionization == batch window twin
(applyInPandasWithState; sessions span micro-batch boundaries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.streaming.sessions import sessionize_batch, sessionize_stream

SCHEMA = "user_id long, ts timestamp, event_id long"


def _events(spark):
    rows = []
    eid = 0
    for u in range(3):
        # user u: 3 sessions of 4 events 10 min apart, sessions separated
        # by 45 min of silence (> the 30-min gap)
        t = 0
        for _s in range(3):
            for _e in range(4):
                rows.append((u, f"2024-01-01 {t // 3600:02d}:{(t % 3600) // 60:02d}:{t % 60:02d}", eid))
                eid += 1
                t += 600
            t += 2700  # 45-min silence closes the session
    return (
        spark.createDataFrame(rows, "user_id long, ts_s string, event_id long")
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id")
    )


def test_stream_sessions_match_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "ev")
    # time-ordered files → sessions SPAN micro-batches (the 2nd session
    # of each user starts in file a and ends in file b)
    ev.filter(F.hour("ts") < 1).coalesce(1).write.parquet(src + "/a")
    ev.filter(F.hour("ts") >= 1).coalesce(1).write.parquet(src + "/b")

    batch = sessionize_batch(ev, gap_seconds=1800)
    want = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in batch.filter(~F.col("is_open")).collect()
    }
    assert len(want) == 6  # 2 closed sessions per user; the 3rd stays open

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == want  # every CLOSED session emitted exactly once


def test_batch_twin_matches_entry_query_semantics(spark):
    """sessionize_batch over the fixture == the events_sessionize entry
    query's (start, end, n) triples (same gap, same tie-break)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize_batch(ev, gap_seconds=1800).collect()
    }
    import __spark_entry__ as E

    want = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in E.queries()["events_sessionize"](spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want
