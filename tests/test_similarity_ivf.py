"""IVF ANN invariants: full-probe == exact; partial probe recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.similarity import cosine_topk, ivf_ann

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.withColumn("embedding", F.transform(F.col("embedding"), lambda x: x.cast("double")))


def test_ivf_full_probe_equals_exact(spark):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["rank"]): r["corpus_id"] for r in cosine_topk(corpus, queries, k=5).collect()}
    n_cells = 8
    full = {
        (r["query_id"], r["rank"]): r["corpus_id"]
        for r in ivf_ann(corpus, queries, n_cells=n_cells, n_probe=n_cells, k=5, iters=1).collect()
    }
    assert full == exact  # probing every cell degrades to exact search


def test_ivf_partial_probe_recall(spark):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    exact = cosine_topk(corpus, queries, k=5).collect()
    approx = ivf_ann(corpus, queries, n_cells=8, n_probe=4, k=5, iters=1).collect()
    exact_set = {(r["query_id"], r["corpus_id"]) for r in exact}
    approx_set = {(r["query_id"], r["corpus_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall {recall}"
    # every query answered
    assert {r["query_id"] for r in approx} == {r["query_id"] for r in exact}


def test_ivf_deterministic(spark):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    a = sorted(map(tuple, ivf_ann(corpus, queries, n_cells=8, n_probe=2, k=5, iters=1).collect()))
    b = sorted(map(tuple, ivf_ann(corpus, queries, n_cells=8, n_probe=2, k=5, iters=1).collect()))
    assert a == b
