"""Per-host politeness rate limiting as a CUSTOM STATEFUL streaming
operator (``applyInPandasWithState``).

The batch engine enforces "at most B fetches per host per round" with a
two-phase window rank (operators/politeness.py); on a continuous stream
of fetch requests the same contract needs per-host STATE carried across
micro-batches: the current window start and its running count. That is
exactly the reference's pacing loop (one sleep-gated fetch at a time
per host, /root/reference/pkg/crawler/web.go:1312-1321) re-expressed as
a token-budget per tumbling window.

State is one (window_start, count) pair per host — bounded by the
number of distinct hosts regardless of request volume, and hosts idle
past the GroupState timeout are evicted (the watermark/TTL analog), so
state never grows with crawl length.

Batch twin: :func:`host_rate_limit_batch` computes identical verdicts
with a window rank — the batch run is the oracle for the streaming run
(tests/test_ratelimit.py).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_SCHEMA = "host string, ts timestamp, url string, allowed boolean"
STATE_SCHEMA = "window_start long, n long"


def host_rate_limit_stream(
    requests: DataFrame,
    budget_per_window: int,
    window_seconds: int = 60,
    host_col: str = "host",
    ts_col: str = "ts",
    url_col: str = "url",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Stream of (host, ts, url) fetch requests → same rows + ``allowed``:
    at most ``budget_per_window`` True per host per tumbling window.

    Requests are processed in event-time order WITHIN each micro-batch
    (sorted); windows are event-time aligned (epoch // window_seconds),
    so a replay of the same files yields the same verdicts.

    ``idle_timeout_ms``: with a value, hosts idle past the timeout are
    evicted from state (TTL for long-running deployments) — note the
    timer makes the query schedule timeout-evaluation micro-batches
    forever, so ``processAllAvailable()`` no longer terminates; leave
    None for bounded replays/tests.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd  # noqa: F401  (worker-side import)

    def limiter(key, pdfs: Iterator["pd.DataFrame"], state: "GroupState"):
        import pandas as pd

        (host,) = key
        if state.hasTimedOut:
            state.remove()
            return
        window_start, n = state.get if state.exists else (-1, 0)
        out_frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, url_col])  # url tie-break = batch twin's order
            allowed = []
            for ts in pdf[ts_col]:
                w = int(ts.timestamp()) // window_seconds
                if w != window_start:
                    window_start, n = w, 0
                ok = n < budget_per_window
                if ok:
                    n += 1
                allowed.append(ok)
            out_frames.append(
                pd.DataFrame(
                    {
                        "host": host,
                        "ts": pdf[ts_col],
                        "url": pdf[url_col],
                        "allowed": allowed,
                    }
                )
            )
        state.update((window_start, n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)  # evict idle hosts (TTL)
        yield from out_frames

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        requests.select(F.col(host_col).alias("host"), F.col(ts_col).alias("ts"), F.col(url_col).alias("url"))
        .groupBy("host")
        .applyInPandasWithState(limiter, OUT_SCHEMA, STATE_SCHEMA, "append", timeout_conf)
    )


def host_rate_limit_batch(
    requests: DataFrame,
    budget_per_window: int,
    window_seconds: int = 60,
    host_col: str = "host",
    ts_col: str = "ts",
    url_col: str = "url",
) -> DataFrame:
    """Batch twin (the streaming oracle): rank within (host, event-time
    window) in event-time order; ``allowed`` = rank ≤ budget."""
    w_id = F.floor(F.col(ts_col).cast("long") / F.lit(window_seconds))
    return requests.select(
        F.col(host_col).alias("host"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
        (F.row_number().over(Window.partitionBy(F.col(host_col), w_id).orderBy(F.col(ts_col), F.col(url_col))) <= budget_per_window).alias("allowed"),
    )
