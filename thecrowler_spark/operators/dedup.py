"""Deduplication family for training-data pipelines.

Exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup. All but SimHash are pure JVM expressions;
SimHash uses an Arrow-batched pandas UDF (numpy bit ops, no per-row
Python).

Reference analog: WebObjects content-hash dedup
(/root/reference/pkg/crawler/crawler.go:1504-1543) is the exact path;
the rest are the scale-out extensions a 100 TB corpus needs.

Scale notes:
- exact dedup = one shuffle on the content hash (map-side partial agg free);
- MinHash LSH turns O(n²) pair search into a band-bucket equi-join —
  the only join is on ``band_key``, AQE handles bucket skew;
- portable hashing uses md5 (identical in DuckDB) so every step has a
  SQL oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per identical normalized text (sha256 key)."""
    h = F.sha2(TX.normalize_text(text_col), 256)
    return (
        docs.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs."""
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(TX.shingles(text_col, k)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Jaccard similarity over k-token shingle sets, candidate pairs only.

    Shared-shingle equi-join generates candidates (docs with zero shared
    shingles can never pass a threshold > 0), then exact Jaccard =
    |∩| / (|A|+|B|−|∩|). One shuffle on shingle + one on the pair key.
    """
    sh = doc_shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("nb"))
    out = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """MinHash signature per doc: mh_i = min over shingles of md5(i:shingle).

    md5-as-permutation is portable (DuckDB computes identical digests),
    so the whole signature has an exact SQL oracle. One shuffle.
    """
    sh = doc_shingles(docs, text_col, id_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature are candidates.

    rows-per-band = n_hashes / bands; band key = md5 of the band's
    concatenated minhashes. Pair generation is an equi-join on
    (band_idx, band_key) — never O(n²).
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, n_hashes, k)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("band_key"))
        )
    banded = sig.select("id", F.explode(F.array(*band_cols)).alias("band")).select(
        "id", "band.band_idx", "band.band_key"
    )
    a = banded.alias("a")
    b2 = banded.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc via an Arrow-batched pandas UDF.

    Token hashes are md5-derived (stable across engines); the bit-vote
    accumulation is numpy (vectorized over the Arrow batch — no
    per-row Python loops over tokens beyond the tokenizer split).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts: "pd.Series") -> "pd.Series":
        import hashlib

        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = [w for w in __import__("re").split(r"[^a-z0-9]+", (t or "").lower()) if w]
            if not toks:
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big", signed=False)
                    for w in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            sim = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sim |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sim)
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit chunks.

    Pigeonhole: distance ≤3 ⇒ at least one of 4 16-bit chunks equal —
    so candidates come from 4 equi-joins, never a cross join.
    """
    sig = simhash64(docs, text_col, id_col)
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_idx"),
                    F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for c in range(4)
            ])
        ).alias("ch"),
    ).select("id", "simhash", "ch.chunk_idx", "ch.chunk")
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def embedding_near_dups(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-dup pairs. Brute force within label blocks if a
    ``label`` column exists, else full pair join (correctness baseline;
    the scale path is :func:`..operators.similarity.lsh_bucketed_ann`)."""
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x))
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("n"))
    a = e.alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.round(dot / (F.col("a.n") * F.col("b.n")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def embedding_near_dups_lsh(
    emb,
    threshold: float = 0.8,
    bits: int = 8,
    tables: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
):
    """Scale path for embedding-cosine near-dup: random-hyperplane LSH
    buckets (reusing :mod:`.similarity`'s deterministic signatures)
    restrict the pair join to same-bucket candidates — O(n·b/2^bits)
    candidate pairs instead of O(n²) — then exact cosine confirms.
    Recall vs the exact O(n²) operator is tested in
    tests/test_dedup_lsh.py; precision is exact (same threshold test)."""
    from pyspark.sql import functions as F

    from thecrowler_spark.operators.similarity import _dot, _norm, lsh_buckets

    if dim is None:
        # convenience inference — one driver round-trip; pass dim
        # explicitly in pipelines. Empty input → no pairs, not a crash.
        first = emb.select(vec_col).first()
        if first is None:
            return emb.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = len(first[0])
    keyed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
        F.explode(lsh_buckets(F.col(vec_col), dim, bits, tables)).alias("b"),
    ).select("id", "v", "n", F.col("b.table").alias("table"), F.col("b.bucket").alias("bucket"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "cosine", F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
