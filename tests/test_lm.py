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


def test_bigram_scores_hand_computed(spark):
    """Conditional bigram scores and the word-ORDER discrimination the
    unigram proxy cannot make (same tokens, scrambled order)."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick"),
            (2, "quick the fox brown quick the"),  # same token multiset
            (3, "solo"),                           # one token: no bigrams
            (4, "??!!"),                           # zero tokens
            (5, "the quick the quick the quick"),  # maximally predictable
        ],
        "doc_id long, text string",
    )
    vocab = {
        (r["t1"], r["t2"]): (r["cnt2"], r["score"])
        for r in LM.bigram_vocab_scores(docs, vocab_size=None).collect()
    }
    # head counts: the->6, quick->5, brown->2, fox->2
    assert vocab[("the", "quick")] == (5, 5_000_000 // 6)
    assert vocab[("the", "fox")] == (1, 1_000_000 // 6)
    assert vocab[("quick", "the")] == (4, 4_000_000 // 5)
    assert vocab[("quick", "brown")] == (1, 1_000_000 // 5)
    assert vocab[("brown", "fox")] == (1, 500_000)
    assert vocab[("brown", "quick")] == (1, 500_000)
    assert vocab[("fox", "brown")] == (1, 500_000)
    assert vocab[("fox", "the")] == (1, 500_000)

    scored = {
        r["doc_id"]: (r["n_bigrams"], r["lm2_score"])
        for r in LM.doc_bigram_scores(docs, vocab_size=None).collect()
    }
    s = lambda t1, t2: vocab[(t1, t2)][1]
    d1 = (2 * s("the", "quick") + s("quick", "brown") + s("brown", "fox")
          + s("fox", "the")) // 5
    d2 = (2 * s("quick", "the") + s("the", "fox") + s("fox", "brown")
          + s("brown", "quick")) // 5
    assert scored[1] == (5, d1)
    assert scored[2] == (5, d2)
    assert d1 > d2  # scrambled word order scores strictly lower
    assert scored[3] == (0, 0)
    assert scored[4] == (0, 0)
    assert scored[5] == (5, (3 * s("the", "quick") + 2 * s("quick", "the")) // 5)


def test_bigram_vocab_cutoff_and_buckets(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # (a,b) x3, (b,a) x2
            (2, "c d c d"),         # (c,d) x2, (d,c) x1
            (3, "x y"),             # (x,y) x1
        ],
        "doc_id long, text string",
    )
    v = LM.bigram_vocab_scores(docs, vocab_size=2).collect()
    # cnt2: (a,b)=3 first; the 2-2 tie between (b,a) and (c,d) breaks
    # on t1 asc -> (b,a) takes the second slot
    assert {(r["t1"], r["t2"]) for r in v} == {("a", "b"), ("b", "a")}
    out = {
        r["doc_id"]: (r["bucket"], r["bucket_label"])
        for r in LM.quality_buckets_bigram(docs, k=3, vocab_size=2).collect()
    }
    # doc 1 scores on both kept bigrams, docs 2/3 are fully OOV (0)
    assert out[1] == (1, "head")
    assert out[2] == (2, "middle") and out[3] == (3, "tail")
