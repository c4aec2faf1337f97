"""Streaming URL-seen dedup == batch dedup (same key set), with
watermark-bounded state. File-source replay of a link stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.streaming.dedup import dedup_discovered_links

SCHEMA = "link string, discovered_at timestamp, src int"


def _links_df(spark):
    rows = []
    for i in range(300):
        # 100 distinct URLs, each discovered 3x with case/slash variants
        base = f"https://H{i % 100}.Example.com/p{i % 100}"
        variant = [base, base + "/", base.lower()][i % 3]
        rows.append((variant, f"2024-01-01 00:{i % 60:02d}:00", i))
    df = spark.createDataFrame(rows, "link string, ts_str string, src int")
    return df.select(
        "link", F.col("ts_str").cast("timestamp").alias("discovered_at"), "src"
    )


def test_streaming_dedup_matches_batch(spark, tmp_path):
    links = _links_df(spark)
    src = str(tmp_path / "links_in")
    # two files → two micro-batches (state must persist across batches)
    links.filter(F.col("src") < 150).coalesce(1).write.parquet(src + "/a")
    links.filter(F.col("src") >= 150).coalesce(1).write.parquet(src + "/b")

    batch_keys = {
        r["norm_url"] for r in dedup_discovered_links(links).select("norm_url").collect()
    }

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    deduped = dedup_discovered_links(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT norm_url FROM dedup_out").collect()
    got_keys = {r["norm_url"] for r in got}
    assert got_keys == batch_keys  # same seen-set
    assert len(got) == len(got_keys)  # no duplicate emissions across batches
    assert len(got_keys) == 100
