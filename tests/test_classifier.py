"""Hashed linear classifier inference: hand-computed margins, OOV
buckets, negative-division truncation, empty docs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from thecrowler_spark.operators.classifier import classify_docs, token_bucket


def _bucket(tok: str, n: int = 4096) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n


def test_token_bucket_matches_python_md5(spark):
    toks = ["alpha", "beta", "the", "x9", "zebra"]
    df = spark.createDataFrame([(t,) for t in toks], ["token"])
    got = {
        r["token"]: r["b"]
        for r in df.select("token", token_bucket(F.col("token")).alias("b")).collect()
    }
    assert got == {t: _bucket(t) for t in toks}


def test_classify_docs_golden(spark):
    # weights chosen per actual md5 buckets so margins are hand-checkable
    w_good, w_bad = 5, -7
    docs = spark.createDataFrame(
        [
            (1, "good good bad"),     # 2*5 - 7 = 3, mean 3 div 3 = 1  -> keep
            (2, "bad bad good"),      # -14 + 5 = -9, mean -9 div 3 = -3 -> toss
            (3, "good unknowntok"),   # 5 + 0 = 5, mean 5 div 2 = 2    -> keep
            (4, "bad good"),          # -2, mean -2 div 2 = -1         -> toss
            (5, "bad bad bad good good"),  # -21+10 = -11, div 5 = -2  -> toss
            (6, ""),                  # empty: margin 0, mean 0        -> keep
        ],
        ["doc_id", "text"],
    )
    weights = spark.createDataFrame(
        [(_bucket("good"), w_good), (_bucket("bad"), w_bad)], ["bucket", "weight"]
    )
    out = {r["doc_id"]: r for r in classify_docs(docs, weights).collect()}
    assert len(out) == 6
    assert (out[1]["margin"], out[1]["mean_margin"], out[1]["label"]) == (3, 1, "keep")
    assert (out[2]["margin"], out[2]["mean_margin"], out[2]["label"]) == (-9, -3, "toss")
    assert (out[3]["margin"], out[3]["mean_margin"], out[3]["label"]) == (5, 2, "keep")
    # -2 div 2 = -1: truncation toward zero must agree with the oracle's //
    assert (out[4]["margin"], out[4]["mean_margin"], out[4]["label"]) == (-2, -1, "toss")
    assert (out[5]["margin"], out[5]["mean_margin"], out[5]["label"]) == (-11, -2, "toss")
    assert (out[6]["n_tokens"], out[6]["margin"], out[6]["label"]) == (0, 0, "keep")


def test_classify_docs_bias_and_threshold(spark):
    docs = spark.createDataFrame([(1, "good"), (2, "")], ["doc_id", "text"])
    weights = spark.createDataFrame([(_bucket("good"), 5)], ["bucket", "weight"])
    out = {
        r["doc_id"]: r
        for r in classify_docs(docs, weights, bias=-3, threshold=3).collect()
    }
    # doc 1: margin 5-3=2, mean 2 < 3 -> toss; doc 2: empty, margin = bias
    assert (out[1]["margin"], out[1]["label"]) == (2, "toss")
    assert (out[2]["margin"], out[2]["mean_margin"], out[2]["label"]) == (-3, 0, "toss")
