"""Unigram-LM quality bucketing (operators/lm.py) vs hand-computed
integer arithmetic."""

from __future__ import annotations

from thecrowler_spark.operators import lm as LM


def test_lm_scores_hand_computed(spark):
    # corpus: 'common' x6, 'rare' x2, 'once' x1, '' doc -> total 9 tokens
    docs = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common common common rare"),
            (3, "once"),
            (4, "??!!"),  # tokenizes to nothing
        ],
        "doc_id long, text string",
    )
    vocab = {
        r["token"]: (r["cnt"], r["score"])
        for r in LM.unigram_vocab_scores(docs, vocab_size=None).collect()
    }
    # scores = cnt * 1e6 DIV 9
    assert vocab == {
        "common": (6, 6_000_000 // 9),
        "rare": (2, 2_000_000 // 9),
        "once": (1, 1_000_000 // 9),
    }

    scored = {
        r["doc_id"]: (r["n_tokens"], r["lm_score"])
        for r in LM.doc_lm_scores(docs, vocab_size=None).collect()
    }
    d12 = (3 * (6_000_000 // 9) + (2_000_000 // 9)) // 4
    assert scored[1] == (4, d12) and scored[2] == (4, d12)
    assert scored[3] == (1, 1_000_000 // 9)
    assert scored[4] == (0, 0)  # zero-token doc kept, lm_score 0


def test_vocab_cutoff_and_oov(spark):
    # vocab_size=1 keeps only the most frequent token; everything else
    # scores 0 (out-of-vocabulary) but still counts in the denominator
    docs = spark.createDataFrame(
        [(1, "hot hot hot cold"), (2, "cold cold warm")],
        "doc_id long, text string",
    )
    v = LM.unigram_vocab_scores(docs, vocab_size=1).collect()
    # cnt: hot=3, cold=3, warm=1 -> tie (3,3) broken by token asc: 'cold'
    assert len(v) == 1 and v[0]["token"] == "cold"

    scored = {
        r["doc_id"]: r["lm_score"] for r in LM.doc_lm_scores(docs, vocab_size=1).collect()
    }
    kept = v[0]["token"]
    s = 3_000_000 // 7
    if kept == "cold":
        assert scored[1] == s // 4 and scored[2] == (2 * s) // 3
    else:
        assert scored[1] == (3 * s) // 4 and scored[2] == 0


def test_quality_buckets_order(spark):
    # 6 docs with strictly decreasing familiarity -> buckets 1,1,2,2,3,3
    rows = [
        (1, "the the the the"),
        (2, "the the the one"),
        (3, "the the one two"),
        (4, "the one two three"),
        (5, "one two three four"),
        (6, "zz yy xx ww"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["bucket"], r["bucket_label"])
        for r in LM.quality_buckets(docs, k=3, vocab_size=None).collect()
    }
    assert [out[i][0] for i in range(1, 7)] == [1, 1, 2, 2, 3, 3]
    assert out[1][1] == "head" and out[3][1] == "middle" and out[6][1] == "tail"
