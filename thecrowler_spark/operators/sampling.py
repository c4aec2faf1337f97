"""Deterministic dataset splitting / sampling for training pipelines.

Hash-based assignment (md5 of key + seed → bucket in [0, 10^6)): a
row's split membership is a pure function of its key, so it is stable
across runs, cluster sizes, partitionings, and dataset growth — new
documents never reshuffle old ones between train and eval (the property
``randomSplit`` does NOT have: it re-draws per run/partitioning).

md5 is computed identically by DuckDB, so both operators carry exact
SQL oracles. All JVM expressions — no shuffle at all: split/sample are
narrow transformations that fuse into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bucket space — 10^6 gives 4-decimal-precision fractions
BUCKETS = 1_000_000


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_bucket(key: Column | str, seed: int = 42) -> Column:
    """Uniform bucket in [0, BUCKETS) from md5(key#seed) — the first 8
    hex chars parsed as an integer (portable to the DuckDB oracle)."""
    h = F.md5(F.concat(_col(key).cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def assign_split(
    key: Column | str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> Column:
    """Deterministic train/val/test label from cumulative weight
    thresholds over the hash bucket. Weights must sum to ≤ 1; any
    remainder falls into the LAST split."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = hash_bucket(key, seed)
    out = F.when(F.lit(False), F.lit(""))
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        out = out.when(b < int(round(cum * BUCKETS)), F.lit(name))
    return out.otherwise(F.lit(names[-1]))


def sample_flag(key: Column | str, fraction: float, seed: int = 42) -> Column:
    """Deterministic Bernoulli(fraction) sample membership. Uniform
    within any stratum (the hash ignores strata), so grouping by a
    stratum column yields a proportional stratified sample for free."""
    return hash_bucket(key, seed) < int(round(fraction * BUCKETS))


def mixture_sample(
    docs,
    weights: dict[str, int],
    budget_tokens: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    buckets: int = 64,
):
    """Deterministic dataset-mixture sampling (the Pile/DoReMi-style
    assembly step): give each source an integer weight; source s gets a
    token budget of ``(budget_tokens * w_s) DIV sum(w)`` (integer-exact)
    and contributes its documents in deterministic md5 order until the
    running token sum reaches the budget — same take-while convention
    as :func:`pack_documents`: a doc is IN while the sum BEFORE it is
    under budget, so each source lands in [budget, budget+max_doc).
    Unknown sources (no weight entry) get budget 0.

    Deterministic in (doc key, seed): regrowing a source only displaces
    docs at its hash-order tail, never reshuffles the kept set wholesale
    — the property random sampling per run does not have.

    Scale shape — two-phase prefix sum, NO per-source window: real
    mixtures are dominated by one source ("web" is ~80% of a 100 TB
    corpus), so a ``partitionBy(source)`` running-sum window would
    serialize that source onto one task. Instead each source's
    hash-ordered stream is split into ``buckets`` contiguous ranges —
    the md5 order key is uniform, so its first-4-hex-chars numeric
    prefix IS a range bucketing, monotone in the sort order and
    computed as a narrow expression (no range exchange, no
    monotonically_increasing_id):

    1. local running sums within (source, range-bucket) — the ONE data
       shuffle, ``hashpartitioning(source, _rb)``, group size bounded
       by ~|source|/buckets regardless of source skew;
    2. per-bucket token totals (map-side partial agg, reuses the same
       partitioning — no second exchange of the doc stream);
    3. prefix-sum offsets over the tiny (#sources × buckets)-row totals
       table, broadcast-joined back:
       ``cum_before = bucket_offset + local_cum_before``.

    Bit-identical to the single-window formulation (the buckets are
    contiguous slices of the same (md5, id) total order). Output:
    input + (source_budget, cum_before, included).
    """
    from pyspark.sql import Window

    total_w = sum(weights.values())
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    budget = F.expr(
        f"CAST({budget_tokens} AS BIGINT) * CAST(_w AS BIGINT) DIV {total_w}"
    )
    order_key = F.md5(F.concat(_col(id_col).cast("string"), F.lit(f"@mix{seed}")))
    # range bucket = numeric prefix of the order key: floor(v*buckets/2^16)
    # over v = first 4 hex chars — monotone in the _ok string order, so
    # per-source concatenation of buckets in _rb order is the global order
    rbucket = F.floor(
        F.conv(F.substring(F.col("_ok"), 1, 4), 16, 10).cast("long")
        * buckets / 65536
    ).cast("int")
    df = (
        docs.withColumn("_w", F.coalesce(wmap[_col(source_col)], F.lit(0)))
        .withColumn("source_budget", budget)
        .withColumn("_ok", order_key)
        .withColumn("_rb", rbucket)
    )
    w_local = (
        Window.partitionBy(source_col, "_rb")
        .orderBy("_ok", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = df.withColumn(
        "_lcum_before",
        (F.sum(_col(token_col)).over(w_local) - _col(token_col)).cast("long"),
    )
    # tiny: one row per (source, bucket); window is over ≤ buckets rows
    totals = local.groupBy(source_col, "_rb").agg(
        F.sum(_col(token_col)).cast("long").alias("_bt")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).cast("long")
    ).select(source_col, "_rb", "_off")
    return (
        local.join(F.broadcast(offsets), [source_col, "_rb"])
        .withColumn("cum_before", (F.col("_off") + F.col("_lcum_before")).cast("long"))
        .withColumn("included", F.col("cum_before") < F.col("source_budget"))
        .select(*docs.columns, "source_budget", "cum_before", "included")
    )


def pack_documents(
    docs,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    buckets: int = 64,
    seed: int = 42,
):
    """Sequence packing: assign documents to fixed-token-budget packs
    (the pretraining batch-prep step that turns ragged documents into
    ~budget-token training sequences).

    Scale shape: docs are hash-spread over ``buckets`` independent
    streams (parallelism = buckets, no global window), packed within
    each stream by a running token sum in deterministic hash order:
    ``pack = floor((cumsum − n_tokens) / budget)``. Each pack's total
    lands in [budget − max_doc_tokens, budget + max_doc_tokens) — the
    streaming approximation of first-fit (exact bin packing is
    inherently sequential; this is the standard distributed rendering).
    Documents longer than the budget get a pack of their own.

    Output: input + (bucket, pack_id). Deterministic in (key, seed) —
    repacking a grown corpus only appends new packs within each bucket
    stream tail, and the md5 ordering is oracle-portable.
    """
    from pyspark.sql import Window

    b = hash_bucket(_col(id_col), seed) % buckets
    order_key = F.md5(F.concat(_col(id_col).cast("string"), F.lit(f"@{seed}")))
    df = docs.withColumn("bucket", b).withColumn("_ok", order_key)
    w = (
        Window.partitionBy("bucket")
        .orderBy("_ok", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(_col(token_col)).over(w)
    pack = F.floor((cum - _col(token_col)) / F.lit(budget)).cast("long")
    return (
        df.withColumn("pack_id", F.concat_ws("_", F.col("bucket"), pack))
        .drop("_ok")
    )
