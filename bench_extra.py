#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4 noop sink).

NOT part of the driver contract — bench.py stays frozen. This harness
times individual headline (or registry) queries with a warm-up run and
N repeats, against the same session config bench.py uses, and writes
``.explain("formatted")`` output to plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--repeats 3] [--plans-tag before] [query ...]
  python bench_extra.py --pipeline            # pipeline lane only
Defaults to the 12 headline queries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

HEADLINE = [
    "url_normalize",
    "url_seen_antijoin",
    "politeness_budget",
    "frontier_claim",
    "keyword_topk",
    "timeseries_buckets",
    "pricing_summary",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_cosine_topk",
    "search_star",
]


def _fresh_spark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from thecrowler_spark.session import get_spark

    s = get_spark(
        app_name="bench-extra",
        cores=CPUS,
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.memory.storageFraction": "0.3"},
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--pipeline-docs", type=int, default=int(os.environ.get("BENCH_PIPELINE_DOCS", "200000")))
    args = ap.parse_args()

    import __spark_entry__ as E

    spark = _fresh_spark()
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).collect()
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()

    if args.pipeline:
        import shutil
        import tempfile

        from jobs.pipeline_job import parse_args as pp, run_pipeline
        from thecrowler_spark.sources.corpus import big_documents_df

        workdir = tempfile.mkdtemp(prefix="bench_extra_pipeline_")
        try:
            inp = f"{workdir}/documents_in"
            big_documents_df(spark, args.pipeline_docs).write.mode("overwrite").parquet(inp)
            pargs = pp(["--input", inp, "--output", f"{workdir}/out"])
            t0 = time.time()
            manifest = run_pipeline(spark, pargs)
            elapsed = time.time() - t0
            manifest["elapsed_sec"] = round(elapsed, 3)
            manifest["docs_per_sec"] = round(manifest["input_rows"] / elapsed, 1)
            print(json.dumps(manifest))
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
        return

    names = args.queries or HEADLINE
    queries = E.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        if args.plans_tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(f"plans/r06/{name}_{args.plans_tag}.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        samples = []
        for i in range(args.repeats + 1):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 3)
            if i > 0:  # first run = warm-up (codegen/scan cache)
                samples.append(el)
            else:
                cold = el
        out[name] = {"cold": cold, "warm": samples, "min": min(samples) if samples else cold}
        spark.catalog.clearCache()
    total_min = round(sum(v["min"] for v in out.values()), 3)
    total_cold = round(sum(v["cold"] for v in out.values()), 3)
    print(json.dumps({"per_query": out, "total_min_warm": total_min, "total_cold": total_cold}))
    spark.stop()


if __name__ == "__main__":
    main()
