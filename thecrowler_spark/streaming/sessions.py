"""Gap-based sessionization as a CUSTOM STATEFUL streaming operator
(``applyInPandasWithState``) — the streaming twin of the batch
``events_sessionize`` query (lag + cumulative-flag windows).

A session is a maximal run of one user's events with no silence longer
than ``gap_seconds``. On a continuous stream that needs per-user STATE
carried across micro-batches: (session_start, last_event_ts, n_events).
A session is EMITTED when its closing gap is observed (the next event
arrives more than ``gap_seconds`` later); the still-open tail session
stays in state — with ``idle_timeout_ms`` set, idle users are flushed
and evicted by the GroupState timer (the TTL analog), so state is
bounded by the number of concurrently-active users, never by stream
length.

Batch twin: :func:`sessionize_batch` computes the same sessions with a
window rank and marks each user's final (still-open) session — the
batch run is the oracle for the streaming run
(tests/test_streaming_sessions.py).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
#: epoch MICROseconds (exact for the fixture's microsecond timestamps)
STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = "event_id",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Stream of (user, ts, …) events → completed sessions
    (user_id, session_start, session_end, n_events).

    Events are processed in event-time order within each micro-batch
    (sorted on ``(ts, order_col)`` — the batch twin's tie-break), so a
    replay of the same files yields the same sessions.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd  # noqa: F401  (worker-side import)

    gap_us = gap_seconds * 1_000_000

    def sessionizer(key, pdfs: Iterator["pd.DataFrame"], state: "GroupState"):
        import pandas as pd

        (uid,) = key

        def frame(rows):
            return pd.DataFrame(
                rows,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield frame(
                    [(uid, pd.Timestamp(start, unit="us"), pd.Timestamp(last, unit="us"), n)]
                )
            return
        start, last, n = state.get if state.exists else (-1, -1, 0)
        done: list[tuple] = []
        for pdf in pdfs:
            sort_cols = [ts_col] + ([order_col] if order_col and order_col in pdf else [])
            pdf = pdf.sort_values(sort_cols)
            for ts in pdf[ts_col]:
                t = ts.value // 1_000  # ns → µs
                if start < 0:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    done.append(
                        (uid, pd.Timestamp(start, unit="us"), pd.Timestamp(last, unit="us"), n)
                    )
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
        state.update((start, last, n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if done:
            yield frame(done)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    cols = [F.col(user_col).alias("user_id"), F.col(ts_col).alias(ts_col)]
    if order_col:
        cols.append(F.col(order_col).alias(order_col))
    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(sessionizer, OUT_SCHEMA, STATE_SCHEMA, "append", timeout_conf)
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = "event_id",
) -> DataFrame:
    """Batch twin (the streaming oracle): lag + cumulative session flag
    per user; ``is_open`` marks each user's final session — the one the
    stream holds in state until a timer or a later event closes it."""
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # epoch MICROseconds — the same resolution the stream compares at
    # (sessions.py:81), so sub-second fractions near the gap boundary
    # sessionize identically in both paths.
    tse = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    gap = tse - F.lag(tse).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    sess = events.withColumn(
        "_sno", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    agg = sess.groupBy(user_col, "_sno").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
    w_last = Window.partitionBy(user_col)
    return agg.withColumn(
        "is_open", F.col("_sno") == F.max("_sno").over(w_last)
    ).select(
        F.col(user_col).alias("user_id"),
        "session_start",
        "session_end",
        "n_events",
        "is_open",
    )
