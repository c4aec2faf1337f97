"""End-to-end training-data pipeline job: every stage drops exactly the
planted offenders, and drops are audited with reasons."""

from __future__ import annotations

import json

from jobs.pipeline_job import parse_args, run_pipeline


def _corpus(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to find some tasty food items "
        "while the sun slowly sets behind the tall old mountain ridge "
    )
    rows = [
        # healthy docs (distinct content, > 20 tokens, varied 2-grams)
        (1, good + "version one extra words here"),
        (2, "an entirely separate article describing how rivers carve deep "
            "canyons through layered sandstone over many thousand years "
            "carrying sediment downstream toward the wide distant delta"),
        (3, "completely different document about spark query planning with "
            "many distinct useful tokens covering shuffles joins windows "
            "aggregates partitions codegen pushdown pruning skew salting"),
        # 10: exact duplicate of 1 -> exact_dup drop (keeper = min id 1)
        (10, good + "version one extra words here"),
        # 11: near-duplicate of 1 (one token changed) -> fuzzy_dup drop
        (11, good + "version one extra words there"),
        # 12: too short -> quality drop
        (12, "tiny doc"),
        # 13: pure repetition -> quality drop (distinct-2gram screen)
        (13, "spam " * 60),
        # 14: benchmark overlap -> contaminated drop
        (14, "the secret benchmark passage that must never leak into "
             "training data appears verbatim right here in this doc "
             "surrounded by enough other tokens to pass the quality bar "
             "and enough length to not be dropped early by anything"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pipeline_stages_and_audit(spark, tmp_path):
    docs_path = str(tmp_path / "docs.parquet")
    bench_path = str(tmp_path / "bench.parquet")
    out = str(tmp_path / "out")
    _corpus(spark).write.parquet(docs_path)
    spark.createDataFrame(
        [(100, "the secret benchmark passage that must never leak")],
        "doc_id long, text string",
    ).write.parquet(bench_path)

    args = parse_args(
        ["--input", docs_path, "--benchmark", bench_path, "--output", out,
         "--budget", "64", "--buckets", "4"]
    )
    m = run_pipeline(spark, args)
    assert m["input_rows"] == 8
    assert m["stages"]["exact_dedup"] == 7       # doc 10 gone
    assert m["stages"]["fuzzy_dedup"] == 6       # doc 11 gone
    assert m["stages"]["quality"] == 4           # docs 12, 13 gone
    assert m["stages"]["decontaminated"] == 3    # doc 14 gone

    curated = spark.read.parquet(out + "/documents")
    assert {r["doc_id"] for r in curated.select("doc_id").collect()} == {1, 2, 3}
    assert {"split", "pack_id", "n_tokens", "lang_pred"} <= set(curated.columns)

    dropped = {
        (r["doc_id"], r["reason"])
        for r in spark.read.parquet(out + "/dropped").collect()
    }
    assert (10, "exact_dup") in dropped
    assert (11, "fuzzy_dup") in dropped
    assert (12, "quality") in dropped and (13, "quality") in dropped
    assert (14, "contaminated") in dropped

    stats = spark.read.parquet(out + "/stats")
    assert stats.count() >= 1  # per-language accounting present
