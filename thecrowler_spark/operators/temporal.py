"""Temporal joins: as-of join and interval (range) join.

Spark has no native AS OF join; the standard scalable re-expression is
the union-merge: interleave probe rows and version rows per key in one
time-ordered window and carry the last version's attributes forward
(``last(..., ignorenulls=True)``) — one shuffle on the key, no range
join, no per-probe subquery. DuckDB *does* have a native ``ASOF JOIN``,
which the oracle uses — so the two engines cross-validate through
completely different algorithms.

Scale notes (100 TB):
- ``asof_join``: one shuffle of (probe ∪ versions) on the key + a
  per-key ordered window. Partitions are bounded by one key's row
  count — fine for dimension-keyed data (many keys); a single mega-key
  serializes onto one task (same class as the frontier's per-source
  windows; split the key or bucket time if that ever matters).
- ``interval_join``: plain equi-join on the key with a range residual
  (ts ∈ [valid_from, valid_to)); Catalyst plans SMJ/broadcast with the
  residual as a post-join filter — no cross product, because the key
  equality is the join condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    versions: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """For each probe row attach the latest version at-or-before its
    timestamp (LEFT semantics: no version ⇒ NULL attrs).

    ``probe`` keeps all its columns; ``versions`` is (key, ts, attrs).
    Ties (version ts == probe ts) attach — 'at-or-before'.
    """
    probe_cols = [c for c in probe.columns]
    v = versions.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(c).alias(f"_v_{c}") for c in attr_cols],
        F.lit(0).alias("_ord"),  # versions sort BEFORE probes at equal ts
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_p_{c}")
          for c in probe_cols if c not in key_cols and c != ts_col],
    )
    p = probe.select(
        *key_cols,
        F.col(ts_col),
        *[F.lit(None).cast(versions.schema[c].dataType).alias(f"_v_{c}") for c in attr_cols],
        F.lit(1).alias("_ord"),
        *[F.col(c).alias(f"_p_{c}")
          for c in probe_cols if c not in key_cols and c != ts_col],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = v.unionByName(p)
    for c in attr_cols:
        merged = merged.withColumn(
            f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w)
        )
    return merged.filter(F.col("_ord") == 1).select(
        *key_cols,
        F.col(ts_col),
        *[F.col(f"_p_{c}").alias(c)
          for c in probe_cols if c not in key_cols and c != ts_col],
        *[F.col(f"_v_{c}").alias(c) for c in attr_cols],
    )


def asof_join_bucketed(
    probe: DataFrame,
    versions: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    bucket: str = "1 day",
) -> DataFrame:
    """Mega-key-safe as-of join: identical semantics to
    :func:`asof_join`, but the merge window partitions on
    ``(key, time-bucket)`` instead of key alone, so one hot key spreads
    over as many tasks as it has active buckets — the escape hatch for
    the per-key serialization documented on :func:`asof_join`.

    Carry-in construction (all bounded, no global windows):

    1. bucket universe = distinct (key, bucket) from BOTH sides (a
       probe-only bucket still needs the state carried in);
    2. per-(key, bucket) LAST version as one ``max(struct(ts, attrs))``
       partial-agg row;
    3. running ``max`` over strictly-earlier buckets per key — a window
       over per-bucket SUMMARY rows (#buckets per key, not row counts);
    4. carry rows stamped at the bucket floor with sort rank −1 (before
       any real version or probe in the bucket), then the same
       union-merge last-non-null window as the base operator, now
       bounded per (key, bucket).

    Version timestamps should be unique per key (ties at identical ts
    resolve by attr struct order here vs. input order in the base
    operator).
    """
    bkt = F.window(F.col(ts_col), bucket)["start"]
    v_b = versions.withColumn("_bkt", bkt)
    p_b = probe.withColumn("_bkt", bkt)
    universe = (
        v_b.select(*key_cols, "_bkt").unionByName(p_b.select(*key_cols, "_bkt")).distinct()
    )
    last_per_bucket = v_b.groupBy(*key_cols, "_bkt").agg(
        F.max(F.struct(F.col(ts_col), *[F.col(c) for c in attr_cols])).alias("_last")
    )
    w_carry = (
        Window.partitionBy(*key_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        universe.join(last_per_bucket, [*key_cols, "_bkt"], "left")
        .withColumn("_carry", F.max("_last").over(w_carry))
        .filter(F.col("_carry").isNotNull())
        .select(
            *key_cols,
            F.col("_bkt"),
            F.col("_bkt").alias(ts_col),  # state as of the bucket floor
            *[F.col("_carry")[c].alias(c) for c in attr_cols],
        )
    )
    probe_cols = list(probe.columns)
    pass_cols = [c for c in probe_cols if c not in key_cols and c != ts_col]

    def _side(df: DataFrame, ord_: int, is_probe: bool) -> DataFrame:
        return df.select(
            *key_cols,
            F.col("_bkt"),
            F.col(ts_col),
            *[
                (F.col(c) if not is_probe else F.lit(None).cast(versions.schema[c].dataType)).alias(f"_v_{c}")
                for c in attr_cols
            ],
            F.lit(ord_).alias("_ord"),
            *[
                (F.col(c) if is_probe else F.lit(None).cast(probe.schema[c].dataType)).alias(f"_p_{c}")
                for c in pass_cols
            ],
        )

    merged = (
        _side(carry, -1, False)
        .unionByName(_side(v_b, 0, False))
        .unionByName(_side(p_b, 1, True))
    )
    w = (
        Window.partitionBy(*key_cols, "_bkt")
        .orderBy(ts_col, "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in attr_cols:
        merged = merged.withColumn(f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w))
    return merged.filter(F.col("_ord") == 1).select(
        *key_cols,
        F.col(ts_col),
        *[F.col(f"_p_{c}").alias(c) for c in pass_cols],
        *[F.col(f"_v_{c}").alias(c) for c in attr_cols],
    )


def interval_join(
    probe: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Join probe rows to the history interval containing their
    timestamp: key equality + ts ∈ [valid_from, valid_to), an open
    (NULL) valid_to meaning 'until now'. Inner semantics."""
    cond = (F.col(ts_col) >= F.col(from_col)) & (
        F.col(to_col).isNull() | (F.col(ts_col) < F.col(to_col))
    )
    return probe.join(history, key_cols, "inner").filter(cond)
