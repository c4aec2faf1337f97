"""Bloom prefilter: exact set equality with plain anti-join + FP-rate sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.bloom import build_bloom, dedup_with_bloom, probe_bloom


def _urls(spark, n, prefix="https://h", tag=""):
    return spark.range(n).select(
        F.concat(
            F.lit(prefix), (F.col("id") % 97).cast("string"),
            F.lit(".example.com/p"), F.col("id").cast("string"), F.lit(tag),
        ).alias("norm_url")
    )


def test_bloom_dedup_equals_antijoin(spark):
    seen = _urls(spark, 20000)
    # candidates: half overlap the seen set, half are new
    cand = _urls(spark, 10000).unionByName(_urls(spark, 10000, tag="-new"))
    want = {r["norm_url"] for r in cand.join(seen, "norm_url", "left_anti").collect()}
    got = {r["norm_url"] for r in dedup_with_bloom(cand, seen, n_buckets=16).collect()}
    assert got == want
    assert len(got) == 10000


def test_bloom_no_false_negatives_and_low_fp(spark):
    seen = _urls(spark, 20000)
    bloom = build_bloom(seen, n_buckets=16, bits_per_key=12, k=7)
    # every seen key must be maybe=True (no false negatives, ever)
    probed_seen = probe_bloom(_urls(spark, 20000), bloom, n_buckets=16)
    assert probed_seen.filter(~F.col("bloom_maybe")).count() == 0
    # unseen keys: false-positive rate well under 1% at 12 bits/key
    probed_new = probe_bloom(_urls(spark, 20000, tag="-new"), bloom, n_buckets=16)
    fp = probed_new.filter(F.col("bloom_maybe")).count()
    assert fp / 20000 < 0.01, f"FP rate {fp / 20000}"
