"""Distributed global ranking — no single-task sorts.

A global ``row_number()/ntile()`` window (``Window.orderBy(...)`` with
no partitionBy) collapses the whole input into ONE task — fine for a
dimension table, a scale-killer on anything event-sized. The classic
two-phase alternative implemented here:

1. ``repartitionByRange`` on the sort keys — a distributed range sort;
   partition *i* holds the *i*-th contiguous key range — then
   ``sortWithinPartitions`` (each task sorts only its slice).
2. Per-partition row numbers WITHOUT a window:
   ``monotonically_increasing_id()`` encodes (partition id << 33) +
   in-partition record number, assigned in the sorted row order — so
   the local rank is a narrow bitmask, not a ``Window.partitionBy``
   (which would force a second full hash exchange on the partition id
   right after the range exchange).
3. Per-partition counts (one row per partition) → prefix-sum offsets
   (a window over #partitions rows, trivially single-task) →
   broadcast-join back: ``global_rn = offset + local_rn``.

ONE shuffle of the data (the range exchange) plus an O(#partitions)
count agg; zero global sorts; scales by raising ``num_partitions``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Append a 1-based global row number under ``order_by`` (which must
    be a deterministic TOTAL order — include a unique tie-break key).

    ``materialize`` localCheckpoints the ranked partitions: the table is
    consumed twice here (per-partition counts + final join) and callers
    like ntile_distributed add a third consumer, so without it the
    INPUT plan executes 3× — ruinous when the input is itself an
    expensive chain (e.g. lm_buckets' corpus scoring). It also pins the
    monotonically_increasing_id assignment to one physical execution.
    """
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *order_by)
    else:
        part = df.repartitionByRange(*order_by)
    part = part.sortWithinPartitions(*order_by)
    mid = F.monotonically_increasing_id()
    local = (
        part.withColumn("_mid", mid)
        .withColumn("_pid", F.shiftright(F.col("_mid"), 33).cast("int"))
        .withColumn("_lrn", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1)
        .drop("_mid")
    )
    if materialize:
        local = local.localCheckpoint(eager=True)
    counts = local.groupBy("_pid").agg(F.count("*").alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def ntile_distributed(
    df: DataFrame,
    k: int,
    order_by: list[Column],
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY ...)`` without the single-task global
    window: two-phase global row number, then the SQL-standard ntile
    arithmetic (first ``n % k`` buckets get ``n//k + 1`` rows, the rest
    ``n//k``) from (rn, total). ``total`` is a 1-row broadcast.
    Bit-identical to the native window given a total order.
    """
    rn = global_row_number(df, order_by, out_col="_rn", num_partitions=num_partitions)
    total = rn.groupBy().agg(F.count("*").alias("_total"))
    qd = F.floor(F.col("_total") / k).cast("long")
    r = (F.col("_total") % k).cast("long")
    big = r * (qd + 1)  # rows covered by the (q+1)-sized buckets
    tile = F.when(
        qd == 0, F.col("_rn")
    ).when(
        F.col("_rn") <= big, F.floor((F.col("_rn") - 1) / (qd + 1)) + 1
    ).otherwise(r + F.floor((F.col("_rn") - big - 1) / qd) + 1)
    return (
        rn.join(F.broadcast(total))
        .withColumn(out_col, tile.cast("int"))
        .drop("_rn", "_total")
    )
