"""Adaptive re-crawl scheduling from observed change history.

The reference's re-crawl cadence is a single fixed interval: the
``update_sources`` proc re-claims every ``completed`` source whose
``last_updated_at`` is older than the configured ``regular_crawling``
interval (/root/reference/pkg/database/postgresql-setup.pgsql:2826-2898
— the gate :func:`.frontier.claim_sources` mirrors). A fixed interval
over-crawls pages that never change and under-crawls pages that churn;
the classic fix is to estimate each source's change rate from its own
snapshot history and schedule the next visit at ~one expected change
per visit (Cho & Garcia-Molina, "Effective page refresh policies for
Web crawlers", ACM TODS 28(4), 2003).

This operator consumes the snapshot history the engine already
produces (one ``(source, ts, content_hash)`` row per completed fetch —
the WebObjects content hash of S8) and emits a per-source schedule:

- change detection = consecutive-snapshot hash inequality (a lag
  window partitioned by source — partitions are bounded by one
  source's retained history, never by corpus size, the same bounded
  shape as :func:`events sessionization <..__spark_entry__>`);
- the estimator is Cho & Garcia-Molina's bias-corrected MLE for the
  Poisson change rate under interval sampling:
  ``r = -ln((n_pairs - X + 0.5) / (n_pairs + 0.5)) / I``
  with ``X`` detected changes over ``n_pairs`` consecutive pairs and
  ``I`` the mean observation spacing (their Eq. for the "improved
  estimator" — exact-ratio form, so both engines divide the same exact
  integers);
- the schedule is ``next_interval = 1/r`` clamped to
  ``[min_interval_s, max_interval_s]``; unseen-history sources get
  ``min_interval_s`` (explore fast), never-changing sources get
  ``max_interval_s``.

Cross-engine determinism follows the DSIR rule (operators/dsir.py):
one ``ln`` over an exactly-representable rational, scaled to integer
micro-units with the textual ``floor(x * 1e6 + 0.5)`` rounding rule in
both engines; every step after the ``ln`` is integer arithmetic
(``DIV``), so the DuckDB oracle reproduces the schedule bit-for-bit.

Scale: one bounded-partition lag window + one groupBy(source) with
partial aggregation — a 10^10-URL corpus with a capped per-source
history (the engine keeps O(tens) of snapshots per source) shuffles
O(#sources) rows once. No collect, no global window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["revisit_schedule"]


def _epoch_s(ts: Column) -> Column:
    # NTZ -> LTZ -> long under the session's UTC tz = the naive epoch,
    # matching DuckDB's epoch_us(ts) // 1_000_000 exactly (same rule as
    # events sessionization).
    return ts.cast("timestamp_ltz").cast("long")


def revisit_schedule(
    snapshots: DataFrame,
    *,
    min_interval_s: int = 900,
    max_interval_s: int = 604800,
) -> DataFrame:
    """Per-source adaptive re-crawl schedule from snapshot history.

    ``snapshots``: (source_id, ts: timestamp, content_hash: string) —
    one row per completed fetch, any partitioning. Returns one row per
    source: (source_id, n_obs, n_changes, avg_interval_s, rate_micro,
    next_interval_s, next_crawl_epoch_s).

    ``rate_micro`` is the Cho & Garcia-Molina estimate of the source's
    change rate in micro-changes-per-mean-interval (integer);
    ``next_interval_s = avg_interval_s * 1e6 DIV rate_micro`` clamped
    to [min_interval_s, max_interval_s] — at the estimate, one expected
    change per visit. Feed ``next_crawl_epoch_s`` into the claim gate
    in place of the fixed ``regular_crawling`` cutoff.
    """
    if min_interval_s <= 0 or max_interval_s < min_interval_s:
        raise ValueError("need 0 < min_interval_s <= max_interval_s")

    w = Window.partitionBy("source_id").orderBy("ts", "content_hash")
    prev = F.lag("content_hash").over(w)
    changed = (prev.isNotNull() & (prev != F.col("content_hash"))).cast("long")
    tse = _epoch_s(F.col("ts"))

    per_source = (
        snapshots.withColumn("_chg", changed)
        .withColumn("_tse", tse)
        .groupBy("source_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum("_chg").alias("n_changes"),
            F.min("_tse").alias("_first_s"),
            F.max("_tse").alias("_last_s"),
        )
    )

    n_pairs = F.col("n_obs") - F.lit(1)
    # integer mean spacing (floor): span DIV pairs; NULL for 1-obs sources
    avg_interval_s = F.when(n_pairs > 0, F.expr("(_last_s - _first_s) DIV (n_obs - 1)"))
    # exact rational: (2*(pairs - X) + 1) / (2*pairs + 1), both operands
    # exact integers cast to double -> identical IEEE division + ln in
    # both engines; floor(x*1e6 + 0.5) is the shared rounding rule.
    ratio = (
        (F.lit(2) * (n_pairs - F.col("n_changes")) + F.lit(1)).cast("double")
        / (F.lit(2) * n_pairs + F.lit(1)).cast("double")
    )
    rate_micro = F.when(
        n_pairs > 0,
        F.floor(-F.ln(ratio) * F.lit(1000000.0) + F.lit(0.5)),
    ).otherwise(F.lit(0))

    lo, hi = F.lit(int(min_interval_s)), F.lit(int(max_interval_s))
    raw_interval = F.expr("(avg_interval_s * 1000000) DIV rate_micro")
    next_interval = (
        F.when(n_pairs <= 0, lo)
        .when(F.col("rate_micro") <= 0, hi)
        .otherwise(F.least(F.greatest(raw_interval, lo.cast("long")), hi.cast("long")))
    )

    return (
        per_source.withColumn("avg_interval_s", avg_interval_s.cast("long"))
        .withColumn("rate_micro", rate_micro.cast("long"))
        .withColumn("next_interval_s", next_interval.cast("long"))
        .withColumn(
            "next_crawl_epoch_s", (F.col("_last_s") + F.col("next_interval_s")).cast("long")
        )
        .select(
            "source_id",
            F.col("n_obs").cast("long").alias("n_obs"),
            F.col("n_changes").cast("long").alias("n_changes"),
            "avg_interval_s",
            "rate_micro",
            "next_interval_s",
            "next_crawl_epoch_s",
        )
    )
