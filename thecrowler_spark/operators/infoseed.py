"""Information-seed scan+claim, set-at-a-time.

Re-expresses the infoseed scheduler's claim transaction
(``ClaimInformationSeeds``, /root/reference/pkg/database/
information_seed_claims.go:89-260 — the same SELECT/UPDATE pair in all
three DBMS arms) as a DataFrame operator — the sibling of
``operators/frontier.claim_sources`` for the InformationSeed table:

- eligibility (:162-168): not disabled AND one of
  ``lower(trim(status)) IN ('new','pending')`` /
  ``'processing'`` with ``last_processed_at`` NULL or older than
  ``now - processing_timeout`` (a crashed runner's seeds are never
  stranded) / ``'error'`` with ``last_error_at`` NULL or older than
  ``now - retry_after`` (error retry backoff);
- optional exact-match ``priority`` restriction (:168 — engines
  specialized by source priority, scheduler.go:31-40);
- FIFO: ``ORDER BY created_at, information_seed_id LIMIT n`` (:169-170)
  — a distributed TakeOrdered, no global sort;
- the UPDATE leg (:196-208): claimed rows get ``status='processing'``,
  ``engine``, ``last_processed_at=now``,
  ``attempts=coalesce(attempts,0)+1``;
- Go contract corners kept: ``limit <= 0`` → empty (:93-95), blank
  ``engine`` rejected (:98-100), priority/engine trimmed (:96-97),
  disabled re-checked even for status-eligible rows
  (scheduler.go:151-153 double-checks too).

``FOR UPDATE SKIP LOCKED`` concurrency becomes the repo-standard
deterministic ownership: pass ``engine_id``/``n_engines`` to shard
seeds by ``pmod(xxhash64(information_seed), n_engines)`` — disjoint
claims with no coordination (same rendering as claim_sources).

Scale shape: eligibility is a pure JVM filter; the claim is
TakeOrdered over ≤limit rows; :func:`merge_claimed_seeds` rewrites the
table state with a broadcast anti/semi of the tiny claimed set — the
seed table itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.intervals import parse_interval_seconds_exact_py


def claim_information_seeds(
    seeds: DataFrame,
    limit: int,
    engine: str,
    now: str,
    priority: str = "",
    processing_timeout: str = "30 minutes",
    retry_after: str = "1 minute",
    engine_id: int | None = None,
    n_engines: int = 1,
) -> DataFrame:
    """Eligible → priority gate → FIFO limit → claimed rows WITH the
    UPDATE applied (the post-claim rows the Go call returns)."""
    engine = engine.strip()
    if not engine:
        raise ValueError("engine is required to claim information seeds")
    if limit <= 0:
        return seeds.limit(0)
    priority = priority.strip()
    now_ts = F.lit(now).cast("timestamp")

    def cutoff(interval: str):
        # exact interval seconds — the claim-timeout boundary is
        # now − interval in the reference, not the pacing-clamped
        # (−1 s) value (ADVICE r5)
        return now_ts - F.expr(f"INTERVAL {parse_interval_seconds_exact_py(interval)} SECOND")

    st = F.lower(F.trim(F.col("status")))
    lpa = F.col("last_processed_at")
    lea = F.col("last_error_at")
    elig = (
        st.isin("new", "pending")
        | ((st == "processing") & (lpa.isNull() | (lpa < cutoff(processing_timeout))))
        | ((st == "error") & (lea.isNull() | (lea < cutoff(retry_after))))
    )
    df = seeds.filter(~F.coalesce(F.col("disabled"), F.lit(False))).filter(elig)
    if priority:
        df = df.filter(F.col("priority") == priority)
    if engine_id is not None and n_engines > 1:
        df = df.filter(
            F.pmod(F.xxhash64(F.col("information_seed")), F.lit(n_engines)) == engine_id
        )
    claimed = df.orderBy("created_at", "information_seed_id").limit(limit)
    return (
        claimed.withColumn("status", F.lit("processing"))
        .withColumn("engine", F.lit(engine))
        .withColumn("last_processed_at", now_ts)
        .withColumn("attempts", F.coalesce(F.col("attempts"), F.lit(0)) + F.lit(1))
    )


def merge_claimed_seeds(seeds: DataFrame, claimed: DataFrame) -> DataFrame:
    """New table state: claimed rows replace their originals (the
    UPDATE's visible effect). ``claimed`` is ≤ limit rows → broadcast
    anti-join; the big side never shuffles."""
    keys = F.broadcast(claimed.select("information_seed_id"))
    untouched = seeds.join(keys, "information_seed_id", "left_anti")
    return untouched.unionByName(claimed.select(*seeds.columns))
