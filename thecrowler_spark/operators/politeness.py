"""Per-host politeness budget as a skew-safe top-k operator.

The reference paces with per-VDI sleeps (interval/delay,
/root/reference/pkg/crawler/web.go:1312-1321,1868-1879); at cluster
scale the equivalent contract is "at most B fetches per host per round"
(B = round_duration / interval). A naive
``row_number() OVER (PARTITION BY host)`` serializes each host into one
task — fatal for a mega-host with 10^9 pending URLs.

Two-phase top-k fixes it:

1. pre-rank within (host, salt): every salt bucket keeps its local
   top-B — parallel across ``salt_buckets`` tasks per host, and shrinks
   the survivor set to ≤ B × S rows per host;
2. final rank within host over survivors only — the big partition is
   now bounded by B × S regardless of input skew.

Result is identical to the single-window rank (the global top-B is a
subset of the union of per-bucket top-Bs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def enforce_host_budget(
    links: DataFrame,
    budgets: DataFrame,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "seq"),
    budget_col: str = "max_fetches_per_round",
    salt_buckets: int = 16,
    salt_on: str | None = None,
    two_phase: bool = True,
) -> DataFrame:
    """Keep at most `budget` links per host, by deterministic order.

    ``budgets`` is broadcast (tiny dimension). Hosts without a budget
    row are unlimited. Returns the input rows + ``fetch_rank``.
    """
    b = F.broadcast(budgets.select(F.col("host").alias(host_col), budget_col))
    df = links.join(b, [host_col], "left")

    order = [F.col(c) for c in order_cols]
    if two_phase:
        salt_src = F.col(salt_on) if salt_on else F.concat_ws("\x00", *order)
        df = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
        w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
        df = (
            df.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col(budget_col).isNull() | (F.col("_r1") <= F.col(budget_col)))
            .drop("_r1", "_salt")
        )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        df.withColumn("fetch_rank", F.row_number().over(w2))
        .filter(F.col(budget_col).isNull() | (F.col("fetch_rank") <= F.col(budget_col)))
        .drop(budget_col)
    )


def budgets_from_intervals(
    host_intervals: DataFrame,
    round_duration_s: float = 60.0,
    host_col: str = "host",
    interval_col: str = "interval_seconds",
) -> DataFrame:
    """Derive per-host budgets from reference pacing math: the engine
    sleeps `interval` seconds between fetches on a host
    (/root/reference/pkg/crawler/web.go:1312-1321), so a round of
    length R allows floor(R / interval) fetches — with the reference's
    3 s minimum effective sleep. This is parity mode for SURVEY.md §7
    trap 7 (budgets mirroring reference pacing).
    """
    eff = F.greatest(F.col(interval_col).cast("double"), F.lit(3.0))
    return host_intervals.select(
        F.col(host_col),
        F.greatest(F.floor(F.lit(float(round_duration_s)) / eff), F.lit(1))
        .cast("int")
        .alias("max_fetches_per_round"),
    )
