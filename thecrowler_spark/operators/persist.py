"""Candidate → Source persistence policy, set-at-a-time.

Re-expresses the infoseed runner's ``persistCandidates`` loop
(/root/reference/pkg/infoseed/runner.go:1103-1174) + the policy upsert
it calls (``UpsertSourceWithPolicy``, /root/reference/pkg/database/
source_upsert_policy.go:35-106) + the discovery-metadata link
(``LinkSourceToInformationSeedWithDiscoveryMetadata``,
information_seed_links.go:160-205) as one DataFrame operator over a
candidate BATCH instead of a per-row transaction loop:

- ``NormalizeSourceURL`` (source.go:106-129): trim + %2F/%3A decode in
  the query part only (subset: no url.Parse round-trip — hosts/paths
  pass through byte-identical, which is all the reference's own
  normalization changes for valid URLs).
- policy branches (source_upsert_policy.go:73-105): existing URL →
  link only when ``link_existing_sources`` (:74-76), config updated
  only when additionally ``update_existing_source_config`` AND the new
  config is meaningful (non-'', 'null', '{}' — :77-81,116-119), source
  fields NEVER overwritten; unknown URL → created only when
  ``create_sources`` (:85-87) with trimmed name/priority, policy
  disabled/status ('' → 'new', :108-114).
- the sequential loop's duplicate-URL behavior is preserved
  deterministically: the FIRST candidate per normalized URL (by
  ``cand_order``) creates; later duplicates take the existing-source
  branch exactly like the Go insert-race path (:89-103).
- links are per (source, seed) idempotent with new-non-null-wins
  metadata (the ON CONFLICT COALESCE(EXCLUDED, old) in all three DBMS
  arms): batch rendering = the LAST linking candidate per URL wins
  each field (all candidate fields are non-null here).

Sequential-vs-set determinism note: new source ids become
``max(existing id) + rank`` in first-candidate order — the same ids a
sequential auto-increment loop would hand out for this batch.

Scale shape: one url-key partial-agg (first-per-url), one url equi-join
against Sources, one broadcast 1-row max-id join, the repo's two-phase
global_row_number for id assignment, one url-key max(struct) for
last-writer links. No windows over the candidate stream, no collect of
candidate data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ranking import global_row_number


@dataclass(frozen=True)
class SourceUpsertPolicy:
    """``SourceUpsertPolicy`` + ``defaultSeedRunConfig`` defaults
    (runner.go:593-598: all three flags true)."""

    create_sources: bool = True
    link_existing_sources: bool = True
    update_existing_source_config: bool = True
    disabled: bool = False
    status: str = "new"


def normalize_source_url(url: Column | str) -> Column:
    """``NormalizeSourceURL``: trim; %2F/%2f → '/', %3A/%3a → ':' in
    the part after the first '?' (RawQuery only)."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    head = F.split_part(u, F.lit("?"), F.lit(1))
    q = F.substring(u, F.length(head) + 2, F.lit(2**30))
    for enc, ch in (("%2F", "/"), ("%2f", "/"), ("%3A", ":"), ("%3a", ":")):
        q = F.replace(q, F.lit(enc), F.lit(ch))
    return F.when(u.contains("?"), F.concat(head, F.lit("?"), q)).otherwise(u)


def _meaningful(config: Column) -> Column:
    """``sourceConfigJSONIsMeaningful`` (source_upsert_policy.go:116-119)."""
    t = F.trim(config)
    return (t != "") & (t != "null") & (t != "{}")


def persist_candidates(
    sources: DataFrame,
    candidates: DataFrame,
    seed_id: int,
    policy: SourceUpsertPolicy = SourceUpsertPolicy(),
    run_priority: str = "",
    run_restricted: int = 2,
    run_flags: int = 0,
    run_config: str = "{}",
) -> dict[str, DataFrame]:
    """Persist a discovery batch under the policy.

    ``sources``: (source_id, url, name, priority, restricted, flags,
    config, disabled, status). ``candidates``: (cand_order, url, title,
    provider, query, rank, score, reason) with optional nullable
    ``{name,priority,restricted,flags,config}_override`` columns
    (runner.go:1121-1138 per-candidate SourceOverrides).

    Returns ``{"audit": per-candidate action rows, "links": final
    per-source link metadata, "sources": the new Sources state}``.
    """
    def ov(col: str, default: Column) -> Column:
        name = f"{col}_override"
        if name in candidates.columns:
            return F.coalesce(F.col(name), default)
        return default

    c = candidates.select(
        F.col("cand_order"),
        normalize_source_url(F.col("url")).alias("url"),
        F.trim(ov("name", F.col("title"))).alias("name"),
        F.trim(ov("priority", F.lit(run_priority))).alias("priority"),
        ov("restricted", F.lit(run_restricted)).cast("int").alias("restricted"),
        ov("flags", F.lit(run_flags)).cast("int").alias("flags"),
        ov("config", F.lit(run_config)).alias("config"),
        "provider", "query", "rank", "score", "reason",
    ).where(F.col("url") != "")

    firsts = c.groupBy("url").agg(F.min("cand_order").alias("_first"))
    ex = sources.select(
        "url", F.col("source_id").alias("_ex_id"), F.lit(True).alias("_exists")
    )
    c = (
        c.join(firsts, "url")
        .join(ex, "url", "left")
        .withColumn("_exists", F.coalesce(F.col("_exists"), F.lit(False)))
    )

    # --- creations: first candidate per unknown URL under create_sources
    creators = (F.col("cand_order") == F.col("_first")) & ~F.col("_exists")
    if policy.create_sources:
        new_rows = c.where(creators)
        max_id = sources.groupBy().agg(
            F.coalesce(F.max("source_id"), F.lit(0)).alias("_max_id")
        )
        new_rows = global_row_number(
            new_rows.join(F.broadcast(max_id)),
            [F.col("cand_order")],
            out_col="_rn",
            materialize=False,
        ).withColumn("source_id", F.col("_max_id") + F.col("_rn"))
        created = new_rows.select(
            "source_id", "url", "name", "priority", "restricted", "flags",
            "config",
            F.lit(policy.disabled).alias("disabled"),
            F.lit(policy.status.strip() or "new").alias("status"),
        )
    else:
        created = sources.limit(0).select(
            "source_id", "url", "name", "priority", "restricted", "flags",
            "config", "disabled", "status",
        )

    cr = created.select("url", F.col("source_id").alias("_new_id"))
    c = c.join(cr, "url", "left")
    sid = F.coalesce(F.col("_ex_id"), F.col("_new_id"))
    is_creator = creators & F.col("_new_id").isNotNull() & F.col("_ex_id").isNull()
    # later duplicates of a created URL take the existing branch (:89-103)
    exists_like = F.col("_exists") | (~creators & F.col("_new_id").isNotNull())

    upd_ok = policy.link_existing_sources and policy.update_existing_source_config
    action = (
        F.when(is_creator, F.lit("created"))
        .when(
            exists_like & F.lit(policy.link_existing_sources)
            & F.lit(upd_ok) & _meaningful(F.col("config")),
            F.lit("linked_config_updated"),
        )
        .when(exists_like & F.lit(policy.link_existing_sources), F.lit("linked"))
        .when(exists_like, F.lit("existing_not_linked"))
        .otherwise(F.lit("skipped_no_create"))
    )
    audit = c.select(
        "cand_order", "url", sid.alias("source_id"), action.alias("action")
    )

    # --- links: creators always link (:1163); existing per policy;
    # last linking candidate wins each (non-null) metadata field
    linkable = audit.where(
        F.col("action").isin("created", "linked", "linked_config_updated")
    ).select("cand_order", "url", "source_id")
    links = (
        c.join(linkable, ["cand_order", "url"])
        .groupBy("source_id")
        .agg(
            F.max(
                F.struct("cand_order", "provider", "query", "rank", "score", "reason")
            ).alias("_m")
        )
        .select(
            "source_id",
            F.lit(seed_id).alias("information_seed_id"),
            F.col("_m.provider").alias("discovery_provider"),
            F.col("_m.query").alias("discovery_query"),
            F.col("_m.rank").alias("discovery_rank"),
            F.col("_m.score").alias("candidate_score"),
            F.col("_m.reason").alias("candidate_reason"),
        )
    )

    # --- new sources state: config updates (last eligible wins) + created.
    # The update set filters on exists_like, not _exists: a later
    # duplicate of a URL this batch CREATED updates the just-created
    # row too, exactly like Go's insert-race path
    # (source_upsert_policy.go:96-99) — and consistent with the audit,
    # which labels those rows 'linked_config_updated' (ADVICE r5).
    if upd_ok:
        upd = (
            c.where(exists_like & _meaningful(F.col("config")))
            .groupBy("url")
            .agg(F.max(F.struct("cand_order", "config")).alias("_u"))
            .select("url", F.col("_u.config").alias("_new_config"))
        )

        def _apply_upd(df):
            return (
                df.join(upd, "url", "left")
                .withColumn("config", F.coalesce(F.col("_new_config"), F.col("config")))
                .drop("_new_config")
            )

        base = _apply_upd(sources)
        created_out = _apply_upd(created)
    else:
        base = sources
        created_out = created
    sources_out = base.select(*created.columns).unionByName(
        created_out.select(*created.columns)
    )

    return {"audit": audit, "links": links, "sources": sources_out}
