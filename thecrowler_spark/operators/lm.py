"""Unigram-LM quality bucketing — CCNet's head/middle/tail step with an
integer-exact familiarity proxy.

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
