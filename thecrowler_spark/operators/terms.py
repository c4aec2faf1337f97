"""Corpus term statistics: TF-IDF distinctive terms + Gopher-style filters.

Training-data-pipeline operators over the ``documents`` table (the
reference's keyword counting, /root/reference/pkg/crawler/keywords.go,
stops at per-page occurrence counts; these extend the same token model
with corpus-level statistics an LLM-data pipeline needs).

Scale notes (100 TB):
- ``tfidf_top_terms``: two shuffles (tf groupBy on (doc, term), df
  groupBy on term) + a per-document window. The per-doc window
  partitions on doc_id so no partition exceeds one document's distinct
  terms. The df join shuffles on term — the term dictionary at corpus
  scale is NOT broadcastable (billions of distinct terms), so we leave
  it a shuffle join and let AQE handle skew on stop-like hot terms
  (keywords_array already strips English stopwords, removing the worst
  heavy hitters by construction).
- ``quality_filter_verdict``: pure per-row JVM expressions; thresholds
  are applied in integer cross-multiplied form (``10*distinct >=
  3*total`` instead of ``distinct/total >= 0.3``) so the verdict is
  exact and the DuckDB oracle can never diverge on an FP boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def term_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, term) → tf over the reference keyword tokenization
    (keywords_array: [3,45]-length, non-stopword)."""
    return (
        docs.select(id_col, F.explode(TX.keywords_array(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def document_frequencies(tf: DataFrame) -> DataFrame:
    """term → number of documents containing it (df). One groupBy on
    term with map-side partial aggregation."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k distinctive terms per document.

    Rank = (tf DESC, df ASC, term ASC) — the same ordering TF-IDF
    (tf × ln(N/df)) induces for fixed tf, but expressed over exact
    integers so results are deterministic and hash-comparable across
    engines (no transcendental ``ln`` in the contract).

    Output: (doc_id, term, tf, df, rank), rank ∈ [1, k].
    """
    tf = term_frequencies(docs, text_col, id_col)
    df_ = document_frequencies(tf)
    scored = tf.join(df_, "term")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )


def repetition_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Per-document repetition signals as exact integers
    (see functions.text.repetition_signals)."""
    total, distinct, top = TX.repetition_signals(F.col(text_col), n=n)
    return docs.select(
        id_col,
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        top.alias("top_count"),
    )


def quality_filter_verdict(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_distinct_pct: int = 30,
    max_top_pct: int = 20,
) -> DataFrame:
    """Gopher-style accept/reject verdict per document.

    Rules (all integer cross-multiplications — exact):
      - token count in [min_tokens, max_tokens]
      - distinct 2-grams ≥ min_distinct_pct% of total 2-grams
        (repetition screen: 100*distinct >= pct*total)
      - most frequent 2-gram ≤ max_top_pct% of total
        (boilerplate screen: 100*top <= pct*total)

    Output: (doc_id, n_tokens, n_ngrams, n_distinct, top_count,
    keep) with keep ∈ {true, false}.
    """
    total, distinct, top = TX.repetition_signals(F.col(text_col), n=2)
    n_tok = TX.token_count(F.col(text_col))
    d = docs.select(
        id_col,
        n_tok.alias("n_tokens"),
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        top.alias("top_count"),
    )
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("n_ngrams") > 0)
        & (100 * F.col("n_distinct") >= min_distinct_pct * F.col("n_ngrams"))
        & (100 * F.col("top_count") <= max_top_pct * F.col("n_ngrams"))
    )
    return d.withColumn("keep", keep)
