"""Streaming ingest → training-data curation: the continuous-feed
composition of the incremental pipeline.

``curate_stream`` attaches jobs/pipeline_job.run_pipeline to a
Structured Streaming source via ``foreachBatch``: every micro-batch of
raw documents runs the full stage chain (exact dedup → fuzzy dedup →
line/boilerplate removal → quality → split/pack) with ``--state``-mode
LakeTable snapshots carried ACROSS micro-batches, so a doc that
duplicates last hour's batch drops as ``exact_dup_prior`` exactly as
it would in the batch twin. Each micro-batch writes its own
``batch=<id>/`` output tree (documents/ dropped/ stats/) — shipped
batches are never retro-edited, the same contract as batch mode.

Semantics vs the batch twin: running the stream over files b1, b2 (one
per trigger) produces byte-identical outputs to two sequential
``run_pipeline`` calls with the same state dir — asserted by
tests/test_streaming_curation.py.

Failure/replay: foreachBatch is at-least-once; a replayed batch is
fully idempotent — hash/sig state merges are distinct unions, and line
counts are tagged per batch (the tag derives from the
``batch=<id>`` output basename) so a replay REPLACES its own
contribution instead of re-adding it — see run_pipeline's state-commit
note. The per-batch output directory is keyed by batch_id, so a
replay overwrites its own tree rather than corrupting a neighbor's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def curate_stream(
    docs_stream: DataFrame,
    output_root: str,
    state_dir: str,
    checkpoint_dir: str,
    extra_args: list[str] | None = None,
):
    """Wire a streaming (doc_id, text) source into the incremental
    curation pipeline. Returns the started StreamingQuery.

    ``extra_args`` appends pipeline_job CLI flags (e.g. ``--span-w 8``
    or ``--model-weights path``) to every micro-batch run.
    """
    from jobs.pipeline_job import parse_args, run_pipeline

    def _batch(df: DataFrame, batch_id: int) -> None:
        args = parse_args(
            [
                "--input", "<stream>",
                "--output", f"{output_root}/batch={batch_id}",
                "--state", state_dir,
            ]
            + (extra_args or [])
        )
        run_pipeline(df.sparkSession, args, docs_df=df)

    return (
        docs_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
