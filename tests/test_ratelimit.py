"""Stateful streaming rate limiter == batch window-rank twin
(applyInPandasWithState; per-host state across micro-batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.streaming.ratelimit import (
    host_rate_limit_batch,
    host_rate_limit_stream,
)

SCHEMA = "host string, ts timestamp, url string"


def _requests(spark):
    rows = []
    for i in range(240):
        host = f"h{i % 3}.example.com"
        # 4 one-minute windows, 20 requests per host per window
        ts = f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}"
        rows.append((host, ts, f"https://{host}/p{i}"))
    return (
        spark.createDataFrame(rows, "host string, ts_s string, url string")
        .select("host", F.col("ts_s").cast("timestamp").alias("ts"), "url")
    )


def test_stream_matches_batch_and_caps(spark, tmp_path):
    reqs = _requests(spark)
    src = str(tmp_path / "reqs")
    # two time-ordered files → two micro-batches; windows span the split,
    # so per-host counts MUST carry across batches via GroupState
    reqs.filter(F.minute("ts") < 2).coalesce(1).write.parquet(src + "/a")
    reqs.filter(F.minute("ts") >= 2).coalesce(1).write.parquet(src + "/b")

    budget, win = 7, 60
    want = {
        (r["host"], str(r["ts"]), r["url"]): r["allowed"]
        for r in host_rate_limit_batch(reqs, budget, win).collect()
    }

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    q = (
        host_rate_limit_stream(stream, budget, win)
        .writeStream.format("memory")
        .queryName("rl_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["host"], str(r["ts"]), r["url"]): r["allowed"]
        for r in spark.sql("SELECT * FROM rl_out").collect()
    }
    assert got == want  # streaming verdicts == batch oracle, every row
    # the cap really binds: exactly `budget` allowed per host per window
    allowed_per = {}
    for (h, ts, _u), ok in got.items():
        w = ts[:16]  # minute window
        allowed_per[(h, w)] = allowed_per.get((h, w), 0) + int(ok)
    assert set(allowed_per.values()) == {budget}
    assert len(allowed_per) == 12  # 3 hosts x 4 windows
