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
