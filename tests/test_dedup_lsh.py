"""LSH-bucketed embedding near-dup: precision exact, recall vs O(n^2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.dedup import embedding_near_dups, embedding_near_dups_lsh

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_neardup_subset_and_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(F.col("vec_id") < 200)
    emb = emb.withColumn("embedding", F.transform(F.col("embedding"), lambda x: x.cast("double")))
    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(emb, threshold=0.8).collect()}
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_lsh(emb, threshold=0.8, bits=6, tables=8).collect()
    }
    # precision is exact: every reported pair passes the true threshold
    assert approx <= exact
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.7, f"recall {recall} over {len(exact)} true pairs"
