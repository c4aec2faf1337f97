"""Unigram- and bigram-LM quality bucketing — CCNet's head/middle/tail
step with integer-exact familiarity scores.

CCNet (Wenzek et al., 2020) buckets web documents by the perplexity of
a KenLM 5-gram model into head (most natural) / middle / tail and
typically trains on head+middle. No LM ships in this container, and
float log-prob sums are order-dependent (a DuckDB-oracle hazard), so
the proxy here is a pure-integer corpus-frequency score:

    token score  = (count(token) * scale) DIV total_tokens
    doc lm_score = sum(score(token) for each OCCURRENCE) DIV n_tokens

High mean frequency ≈ high predictability ≈ low perplexity, so the
bucket ORDER matches CCNet's (head = most familiar). Integer DIV makes
every value exact — the DuckDB oracle reproduces scores bit-for-bit in
any evaluation order.

Scale shape (100 TB):
- vocabulary = top-``vocab_size`` tokens by (count desc, token):
  TakeOrderedAndProject (bounded by K, no global sort) and small enough
  to BROADCAST to the scoring join — the exploded occurrence stream
  never shuffles on the hot-token key, so 'the' skew cannot pile onto
  one task (``vocab_size=None`` keeps every token and falls back to a
  shuffle join + AQE skew handling).
- out-of-vocabulary occurrences score 0 (maximally unfamiliar), the
  CCNet-style fixed-vocab contract.
- bucketing = operators.ranking.ntile_distributed (two-phase global
  rank, one range exchange, bit-identical to the native window).

The bigram variant (quality_buckets_bigram) moves one Markov step
closer to CCNet's actual KenLM: doc score = mean integer conditional
frequency P(t2 | t1) over adjacent token pairs, so frequent words in
improbable ORDER score low where the unigram proxy cannot tell. Same
broadcast-vocab / two-phase-ntile scale shape.

The vocabulary cutoff is LOAD-BEARING for the bigram score, not just a
memory bound: a conditional-only score rewards rare-but-deterministic
pairs (a once-seen head with a once-seen continuation has P = 1.0, the
maximum — unique gibberish would outscore fluent prose). The top-K-by-
count cutoff sends those rare pairs out of vocabulary (score 0),
restoring the KenLM-like behavior; vocab_size=None is therefore only
sensible for the unigram variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from .ranking import ntile_distributed

#: fixed-point scale for token scores (6 decimal digits of frequency)
SCORE_SCALE = 1_000_000


def unigram_vocab_scores(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = 50_000,
    scale: int = SCORE_SCALE,
) -> DataFrame:
    """(token, cnt, score) for the corpus's top-``vocab_size`` tokens.

    score = (cnt * scale) DIV total over ALL token occurrences (the
    denominator counts out-of-vocabulary occurrences too, so scores are
    true corpus frequencies regardless of the vocab cutoff). The
    cutoff order (cnt desc, token asc) is total, so the vocabulary is
    deterministic and the oracle's row_number() mirror selects the
    identical set.
    """
    toks = docs.select(F.explode(TX.tokens(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    scored = counts.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.expr(f"(cnt * {scale}L) DIV _total").alias("score"),
    )
    if vocab_size is not None:
        scored = scored.orderBy(F.col("cnt").desc(), F.col("token")).limit(vocab_size)
    return scored


def doc_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = 50_000,
    scale: int = SCORE_SCALE,
) -> DataFrame:
    """(doc_id, n_tokens, lm_score): occurrence-weighted mean token
    familiarity, integer-exact. Zero-token docs keep lm_score = 0."""
    vocab = unigram_vocab_scores(docs, text_col, vocab_size, scale)
    occurrences = docs.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("token")
    )
    join_side = F.broadcast(vocab) if vocab_size is not None else vocab
    per_doc = (
        occurrences.join(join_side.select("token", "score"), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.expr("sum(coalesce(score, 0L)) DIV count(*)").alias("lm_score"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("lm_score", F.lit(0)).alias("lm_score"),
        )
    )


def _bigram_pairs(text_col) -> F.Column:
    """array<struct<t1,t2>> of adjacent token pairs — one JVM
    ``zip_with`` of the token array with its own tail, no UDF.
    (Not ``sequence(1, size-1)``: Spark's sequence DESCENDS when
    stop < start, so one-token docs would index out of bounds;
    zero-length slices just zip to an empty array.)"""
    n = f"greatest(size({text_col}) - 1, 0)"
    return F.expr(
        f"zip_with(slice({text_col}, 1, {n}), slice({text_col}, 2, {n}),"
        f" (a, b) -> struct(a AS t1, b AS t2))"
    )


def bigram_vocab_scores(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = 50_000,
    scale: int = SCORE_SCALE,
) -> DataFrame:
    """(t1, t2, cnt2, score) for the corpus's top-``vocab_size`` bigrams.

    score = (cnt(t1, t2) * scale) DIV cnt(t1) — the integer fixed-point
    CONDITIONAL frequency P(t2 | t1), with cnt(t1) the bigram-head
    count (sum of cnt2 over the head's continuations), so scores form a
    proper conditional distribution per head. This is one Markov step
    closer to CCNet's KenLM than the unigram proxy: a doc full of
    frequent tokens in IMPROBABLE order now scores low.

    Scale shape: the bigram count is one (t1, t2)-keyed partial-agg
    shuffle over the pair stream; the head count derives from the
    already-collapsed bigram table (rows = distinct bigrams, not
    occurrences — 'the'-skew dies in the map-side combine); the cutoff
    is TakeOrdered by (cnt2 desc, t1, t2), bounded by K.
    """
    toks = docs.select(TX.tokens(F.col(text_col)).alias("_t"))
    bi = toks.select(F.explode(_bigram_pairs("_t")).alias("p")).select(
        F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2")
    )
    counts2 = bi.groupBy("t1", "t2").agg(F.count("*").alias("cnt2"))
    counts1 = counts2.groupBy("t1").agg(F.sum("cnt2").alias("cnt1"))
    scored = counts2.join(counts1, "t1").select(
        "t1", "t2", "cnt2", F.expr(f"(cnt2 * {scale}L) DIV cnt1").alias("score")
    )
    if vocab_size is not None:
        scored = scored.orderBy(
            F.col("cnt2").desc(), F.col("t1"), F.col("t2")
        ).limit(vocab_size)
    return scored


def doc_bigram_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = 50_000,
    scale: int = SCORE_SCALE,
) -> DataFrame:
    """(doc_id, n_bigrams, lm2_score): occurrence-weighted mean bigram
    conditional familiarity, integer-exact. Docs with fewer than two
    tokens have no bigrams and keep lm2_score = 0; out-of-vocabulary
    bigrams score 0 (the fixed-vocab contract, as in the unigram
    path)."""
    vocab = bigram_vocab_scores(docs, text_col, vocab_size, scale)
    occurrences = (
        docs.select(F.col(id_col), TX.tokens(F.col(text_col)).alias("_t"))
        .select(F.col(id_col), F.explode(_bigram_pairs("_t")).alias("p"))
        .select(F.col(id_col), F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
    )
    join_side = F.broadcast(vocab) if vocab_size is not None else vocab
    per_doc = (
        occurrences.join(join_side.select("t1", "t2", "score"), ["t1", "t2"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr("sum(coalesce(score, 0L)) DIV count(*)").alias("lm2_score"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("lm2_score", F.lit(0)).alias("lm2_score"),
        )
    )


def quality_buckets_bigram(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    vocab_size: int | None = 50_000,
    scale: int = SCORE_SCALE,
) -> DataFrame:
    """Bigram-LM quality buckets — same head/middle/tail contract as
    :func:`quality_buckets` but ranked by the bigram conditional score
    (word-ORDER familiarity, not just word frequency). Output:
    (doc_id, n_bigrams, lm2_score, bucket, bucket_label)."""
    scored = doc_bigram_scores(docs, text_col, id_col, vocab_size, scale)
    tiled = ntile_distributed(
        scored,
        k,
        order_by=[F.col("lm2_score").desc(), F.col(id_col)],
        out_col="bucket",
    )
    label = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        if k == 3
        else F.col("bucket").cast("string")
    )
    return tiled.select(
        id_col, "n_bigrams", "lm2_score", "bucket", label.alias("bucket_label")
    )


def quality_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    vocab_size: int | None = 50_000,
    scale: int = SCORE_SCALE,
) -> DataFrame:
    """CCNet-style quality buckets: rank docs by lm_score desc (most
    familiar first; ties broken by id for a total order) and ntile into
    ``k`` buckets. k=3 labels them head/middle/tail; other k keep the
    bucket number as the label. Output: (doc_id, n_tokens, lm_score,
    bucket, bucket_label)."""
    scored = doc_lm_scores(docs, text_col, id_col, vocab_size, scale)
    tiled = ntile_distributed(
        scored,
        k,
        order_by=[F.col("lm_score").desc(), F.col(id_col)],
        out_col="bucket",
    )
    label = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        if k == 3
        else F.col("bucket").cast("string")
    )
    return tiled.select(
        id_col, "n_tokens", "lm_score", "bucket", label.alias("bucket_label")
    )
