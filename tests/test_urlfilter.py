"""URL quality filter: planted blocklist / word-score / fragment cases,
plus the keep-best-copy representative policy for dedup clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.urlfilter import (
    DEFAULT_THRESHOLD,
    url_quality_filter,
)


def _run(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    blocklist = spark.createDataFrame(
        [("evil.example.com",), ("spam2.example.com",)], "host string"
    )
    return {
        r["url"]: r
        for r in url_quality_filter(df, blocklist).collect()
    }


def test_blocklist_hit_drops_exact_host_only(spark):
    out = _run(
        spark,
        [
            "https://evil.example.com/fine/path",
            "https://sub.evil.example.com/fine/path",  # NOT on list (exact match)
            "https://good.example.com/fine/path",
        ],
    )
    assert out["https://evil.example.com/fine/path"]["blocked_domain"]
    assert not out["https://evil.example.com/fine/path"]["kept"]
    assert not out["https://sub.evil.example.com/fine/path"]["blocked_domain"]
    assert out["https://sub.evil.example.com/fine/path"]["kept"]
    assert out["https://good.example.com/fine/path"]["kept"]


def test_word_score_sums_weights_and_thresholds(spark):
    out = _run(
        spark,
        [
            "https://a.example.com/poker/bet-now",  # 2.0 + 1.5 = 3.5 >= 2 → drop
            "https://a.example.com/free-download",  # 0.5 + 0.5 = 1.0 < 2 → keep
            "https://a.example.com/plain/article",  # 0.0 → keep
        ],
    )
    assert out["https://a.example.com/poker/bet-now"]["word_score"] == 3.5
    assert not out["https://a.example.com/poker/bet-now"]["kept"]
    assert out["https://a.example.com/free-download"]["word_score"] == 1.0
    assert out["https://a.example.com/free-download"]["kept"]
    assert out["https://a.example.com/plain/article"]["word_score"] == 0.0
    assert out["https://a.example.com/plain/article"]["kept"]


def test_strict_fragment_blocks_regardless_of_score(spark):
    out = _run(
        spark,
        [
            "https://a.example.com/casino-royale",  # fragment, word score 0
            "https://a.example.com/XXX-gallery",  # case-insensitive
            "https://a.example.com/wares/shop",  # 'wares' != 'warez'
        ],
    )
    assert out["https://a.example.com/casino-royale"]["frag_hit"]
    assert not out["https://a.example.com/casino-royale"]["kept"]
    assert out["https://a.example.com/XXX-gallery"]["frag_hit"]
    assert not out["https://a.example.com/wares/shop"]["frag_hit"]
    assert out["https://a.example.com/wares/shop"]["kept"]


def test_threshold_is_strict_less_than(spark):
    df = spark.createDataFrame(
        [(0, "https://a.example.com/poker")], "id long, url string"  # exactly 2.0
    )
    blocklist = spark.createDataFrame([("x.example.com",)], "host string")
    row = url_quality_filter(df, blocklist, threshold=DEFAULT_THRESHOLD).first()
    assert row["word_score"] == DEFAULT_THRESHOLD
    assert not row["kept"]


def test_select_representatives_keeps_highest_quality(spark):
    from thecrowler_spark.operators.dedup import select_representatives

    comps = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (7, 70), (8, 70)], "id long, component long"
    )
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (7, 50), (8, 50)],
        "doc_id long, n_chars long",
    )
    out = {r["component"]: r for r in select_representatives(comps, docs).collect()}
    # quality argmax; quality tie (2 vs 3, 7 vs 8) breaks to the LOWEST id
    assert out[10]["kept_id"] == 2 and out[10]["kept_quality"] == 300
    assert out[10]["n_members"] == 3
    assert out[70]["kept_id"] == 7 and out[70]["n_members"] == 2
