"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the selection step of "Data Selection for Language Models
via Importance Resampling" (Xie et al., NeurIPS 2023) — the standard
way to skim a 100 TB raw crawl for documents that look like a target
domain (Wikipedia/books/curated web):

    features(doc) = hashed bag of word uni+bigrams into B buckets
    w[b]          = log p_target(b) − log p_raw(b)   (+1 smoothing)
    score(doc)    = Σ_occurrences w[bucket(gram)]
    select        = top-k scores (the paper's Gumbel-top-k reduces to
                    plain top-k at temperature → 0; the deterministic
                    variant is what an exact oracle can grade)

Engine/oracle parity: the LOG-RATIO weights are fixed-point integers
(floor(1e6·Δlog + 0.5) — one explicit rounding rule, no library
round() semantics), so document scores are INTEGER sums — exact and
accumulation-order-independent. The fit computes (t_b+1)/(T+B) and
(r_b+1)/(R+B) as IEEE doubles from integer counts; Python's math.log
and DuckDB's ln evaluate the same libm on identical operands, and the
Spark side never touches floating point at all (weights arrive as an
integer broadcast table, the classifier's model-as-data shape).

Scale shape (100 TB):
- fit: gram stream → md5 bucket (portable) → groupBy(bucket) — ONE
  shuffle to ≤ B keys with map-side partial agg; the two B-row
  histograms are collect()ed (cap-guarded by B — this is the bounded
  model-fit collect, same contract as the crawl counters) and the
  weight table re-enters as a ≤ B-row broadcast.
- score: exploded grams join the BROADCAST weights — the gram stream
  never shuffles on the gram key, hot grams die in the per-doc partial
  agg; one real shuffle (groupBy doc).
- select: orderBy(...).limit(k) is Spark's TakeOrdered — per-partition
  top-k then a driver merge of k·partitions rows, NO global sort
  shuffle.

Reference tie-in: the crawl engine ships corpora; this operator (with
classifier.py and lm.py) is the triage family a training-data consumer
of /root/reference's crawler output runs next.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from .classifier import token_bucket


def doc_grams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, gram) with OCCURRENCE multiplicity: word unigrams +
    space-joined bigrams over the lowercased-alnum token stream (the
    paper's hashed n-gram featurization, n ∈ {1, 2})."""
    def grams(t):
        n = F.size(t)
        bi = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(t, bi)

    # bind the token array once per row so the bigram lambda references
    # the materialized array instead of re-splitting the doc per index
    exploded = TX.bind_once(TX.tokens(F.col(text_col)), grams)
    return docs.select(F.col(id_col), F.explode(exploded).alias("gram"))


def bucket_histogram(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Corpus-level hashed-gram histogram: (bucket, cnt). One shuffle
    to ≤ ``n_buckets`` keys; partial agg absorbs the gram volume."""
    return (
        doc_grams(docs, text_col, id_col)
        .withColumn("bucket", token_bucket(F.col("gram"), n_buckets))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _w_int(t: int, big_t: int, r: int, big_r: int, n_buckets: int) -> int:
    """floor(1e6·(ln((t+1)/(T+B)) − ln((r+1)/(R+B))) + 0.5) — the one
    rounding rule both engines apply (DuckDB mirrors this textually)."""
    d = math.log((t + 1) / (big_t + n_buckets)) - math.log((r + 1) / (big_r + n_buckets))
    return int(math.floor(1e6 * d + 0.5))


def fit_importance_weights(
    spark: SparkSession,
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> tuple[DataFrame, int]:
    """Fit the per-bucket integer log-ratio weights from a target and a
    raw corpus. Returns (weights DataFrame (bucket, weight), default
    weight for buckets unseen by BOTH corpora — relevant only when
    scoring docs outside the fit pools).
    """
    t_counts = dict(
        (r["bucket"], r["cnt"])
        for r in bucket_histogram(target, text_col, id_col, n_buckets).collect()
    )
    r_counts = dict(
        (r["bucket"], r["cnt"])
        for r in bucket_histogram(raw, text_col, id_col, n_buckets).collect()
    )
    big_t, big_r = sum(t_counts.values()), sum(r_counts.values())
    buckets = sorted(set(t_counts) | set(r_counts))
    rows = [
        (b, _w_int(t_counts.get(b, 0), big_t, r_counts.get(b, 0), big_r, n_buckets))
        for b in buckets
    ]
    w0 = _w_int(0, big_t, 0, big_r, n_buckets)
    return spark.createDataFrame(rows, "bucket int, weight long"), w0


def importance_scores(
    docs: DataFrame,
    weights: DataFrame,
    default_weight: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(doc_id, n_grams, score): score = Σ over gram occurrences of the
    bucket's integer weight. Docs with no grams score 0."""
    scored = (
        doc_grams(docs, text_col, id_col)
        .withColumn("bucket", token_bucket(F.col("gram"), n_buckets))
        .join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("weight", F.lit(default_weight))).alias("score"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
        )
    )


def dsir_select(
    spark: SparkSession,
    target: DataFrame,
    raw: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """End-to-end DSIR selection: fit on (target, raw), score the raw
    pool, keep the top ``k`` docs by (score desc, doc_id asc — a total
    order). Zero-gram docs are excluded: a doc with no features has no
    importance estimate, and its score of 0 would otherwise outrank
    every real doc whenever raw-side mass dominates (log-ratio sums go
    negative) — the length-bias footgun of unnormalized importance
    weights. Returns (doc_id, n_grams, score, rank)."""
    from pyspark.sql import Window

    weights, w0 = fit_importance_weights(
        spark, target, raw, text_col, id_col, n_buckets
    )
    scores = importance_scores(raw, weights, w0, text_col, id_col, n_buckets)
    top = (
        scores.filter(F.col("n_grams") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    # rank over ≤ k rows (bounded window — the ann_cosine_topk precedent)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
