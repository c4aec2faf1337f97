"""Streaming ingest curation == sequential incremental batch twin:
the same two batches produce identical outputs whether fed as
micro-batches through curate_stream or as two run_pipeline calls."""

from __future__ import annotations

import time

from jobs.pipeline_job import parse_args, run_pipeline
from thecrowler_spark.streaming.curation import curate_stream

FOOTER = "subscribe to our newsletter today please friends"
BODIES = {
    1: "a healthy article with plenty of distinct informative tokens "
       "covering many separate topics like rivers mountains forests "
       "deserts oceans climates seasons minerals animals and plants",
    2: "an entirely separate essay describing how glaciers carve wide "
       "valleys through ancient granite over countless winters "
       "leaving moraines and polished stone behind the melting ice",
    23: "a fresh fourth piece on tidal estuaries where brackish water "
        "mixes daily nutrients feeding migratory birds crabs oysters "
        "and seagrass meadows along the shifting muddy channels",
}


def _doc(i, n_footer=0):
    return (i, "\n".join([BODIES[i]] + [FOOTER] * n_footer))


def _batches(spark):
    b1 = spark.createDataFrame([_doc(1, 2), _doc(2, 2)], "doc_id long, text string")
    # 21 duplicates batch 1's doc 1 across the batch boundary; 23 adds
    # the footer a 5th time (cumulative 4+1 > 4 -> boilerplate now)
    b2 = spark.createDataFrame(
        [(21, _doc(1, 2)[1]), _doc(23, 1)], "doc_id long, text string"
    )
    return b1, b2


def _read_outputs(spark, root, batches):
    docs, dropped = {}, set()
    for b in batches:
        p = f"{root}/{b}"
        for r in spark.read.parquet(p + "/documents").select("doc_id", "text").collect():
            docs[r["doc_id"]] = r["text"]
        for r in spark.read.parquet(p + "/dropped").collect():
            dropped.add((r["doc_id"], r["reason"]))
    return docs, dropped


def test_curate_stream_matches_sequential_batches(spark, tmp_path):
    b1, b2 = _batches(spark)

    # ---- batch twin: two sequential incremental runs
    bstate, bout = str(tmp_path / "bstate"), str(tmp_path / "bout")
    for name, df in (("b0", b1), ("b1", b2)):
        inp = str(tmp_path / f"in_{name}")
        df.write.parquet(inp)
        run_pipeline(spark, parse_args(
            ["--input", inp, "--output", f"{bout}/{name}", "--state", bstate,
             "--budget", "64", "--buckets", "2"]
        ))
    want_docs, want_dropped = _read_outputs(spark, bout, ["b0", "b1"])

    # ---- streaming twin: same batches as files, one per trigger
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(src + "/a")
    time.sleep(1.1)  # file-source ordering is by modification time
    b2.coalesce(1).write.parquet(src + "/b")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = curate_stream(
        stream,
        output_root=str(tmp_path / "sout"),
        state_dir=str(tmp_path / "sstate"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        extra_args=["--budget", "64", "--buckets", "2"],
    )
    q.awaitTermination(120)
    got_docs, got_dropped = _read_outputs(
        spark, str(tmp_path / "sout"), ["batch=0", "batch=1"]
    )

    assert got_docs == want_docs
    assert got_dropped == want_dropped
    # the cross-batch behaviors actually fired
    assert (21, "exact_dup_prior") in got_dropped
    assert FOOTER in got_docs[1] and FOOTER not in got_docs[23]
