"""Candidate persistence policy vs the reference's own scenarios.

Each test mirrors a scenario from /root/reference/pkg/infoseed/
runner_persist_policy_test.go:16-113 (existing-link default, create=
false, link-existing=false, config override + no-overwrite, link
idempotency) — expectations transcribed, set-at-a-time rendering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.persist import (
    SourceUpsertPolicy,
    normalize_source_url,
    persist_candidates,
)

SRC_SCHEMA = (
    "source_id long, url string, name string, priority string, restricted int, "
    "flags int, config string, disabled boolean, status string"
)
CAND_SCHEMA = (
    "cand_order int, url string, title string, provider string, query string, "
    "rank int, score double, reason string"
)


def _sources(spark, rows):
    return spark.createDataFrame(rows, SRC_SCHEMA)


def _cands(spark, rows):
    return spark.createDataFrame(rows, CAND_SCHEMA)


def _src(sid, url, name="existing", priority="high", config='{"version":"old"}'):
    return (sid, url, name, priority, 2, 0, config, False, "completed")


def _cand(order, url, title="discovered", provider="p", query="q", rank=1,
          score=0.5, reason="r"):
    return (order, url, title, provider, query, rank, score, reason)


def test_existing_url_links_by_default_without_overwriting_fields(spark):
    # persist_policy_test.go:16-31
    sources = _sources(spark, [_src(7, "https://example.test/")])
    out = persist_candidates(
        sources, _cands(spark, [_cand(0, "https://example.test/")]), seed_id=1
    )
    audit = out["audit"].collect()
    assert [(r["action"], r["source_id"]) for r in audit] == [("linked", 7)]
    links = out["links"].collect()
    assert len(links) == 1 and links[0]["source_id"] == 7
    s = out["sources"].collect()
    assert len(s) == 1
    # run_config default '{}' is not meaningful → no config update,
    # name/priority untouched
    assert (s[0]["name"], s[0]["priority"], s[0]["config"]) == (
        "existing", "high", '{"version":"old"}')


def test_create_sources_false_only_links_existing(spark):
    # persist_policy_test.go:34-53
    sources = _sources(spark, [_src(3, "https://existing.test/", priority="medium")])
    out = persist_candidates(
        sources,
        _cands(spark, [_cand(0, "https://existing.test/", "existing"),
                       _cand(1, "https://new.test/", "new")]),
        seed_id=1,
        policy=SourceUpsertPolicy(create_sources=False),
    )
    acts = {r["url"]: r["action"] for r in out["audit"].collect()}
    assert acts == {"https://existing.test/": "linked",
                    "https://new.test/": "skipped_no_create"}
    assert out["sources"].count() == 1
    assert [r["source_id"] for r in out["links"].collect()] == [3]


def test_link_existing_false_skips_existing_links(spark):
    # persist_policy_test.go:56-75
    sources = _sources(spark, [_src(3, "https://existing.test/", priority="medium")])
    out = persist_candidates(
        sources,
        _cands(spark, [_cand(0, "https://existing.test/", "existing"),
                       _cand(1, "https://new.test/", "new")]),
        seed_id=1,
        policy=SourceUpsertPolicy(link_existing_sources=False),
    )
    acts = {r["url"]: r["action"] for r in out["audit"].collect()}
    assert acts == {"https://existing.test/": "existing_not_linked",
                    "https://new.test/": "created"}
    links = out["links"].collect()
    assert len(links) == 1 and links[0]["source_id"] == 4  # max(3) + 1
    rows = {r["url"]: r for r in out["sources"].collect()}
    assert len(rows) == 2
    new = rows["https://new.test/"]
    assert (new["source_id"], new["name"], new["status"], new["disabled"]) == (
        4, "new", "new", False)


def test_config_override_and_no_overwrite_policy(spark):
    # persist_policy_test.go:78-97: meaningful run config updates the
    # existing source's config (fields untouched); with
    # update_existing_source_config=False it does not.
    sources = _sources(spark, [_src(7, "https://example.test/")])
    cands = _cands(spark, [_cand(0, "https://example.test/", "candidate")])
    out = persist_candidates(
        sources, cands, seed_id=1, run_priority="low",
        run_config='{"custom":"seed-config"}',
    )
    s = out["sources"].collect()[0]
    assert s["config"] == '{"custom":"seed-config"}'
    assert (s["name"], s["priority"]) == ("existing", "high")  # never overwritten
    assert out["audit"].first()["action"] == "linked_config_updated"

    blocked = persist_candidates(
        sources, cands, seed_id=1, run_config='{"custom":"blocked-config"}',
        policy=SourceUpsertPolicy(update_existing_source_config=False),
    )
    assert blocked["sources"].collect()[0]["config"] == '{"version":"old"}'
    assert blocked["audit"].first()["action"] == "linked"


def test_link_idempotency_and_last_writer_metadata(spark):
    # persist_policy_test.go:100-113 + the links COALESCE upsert: one
    # link row per (source, seed); duplicate candidates in the batch =
    # the sequential re-link, last writer's fields win.
    sources = _sources(spark, [_src(7, "https://example.test/", priority="medium",
                                    config="{}")])
    out = persist_candidates(
        sources,
        _cands(spark, [
            _cand(0, "https://example.test/", provider="provider-a",
                  query="query-a", rank=1, score=0.5),
            _cand(1, "https://example.test/", provider="provider-b",
                  query="query-b", rank=2, score=0.25),
        ]),
        seed_id=1,
    )
    links = out["links"].collect()
    assert len(links) == 1
    l = links[0]
    assert (l["discovery_provider"], l["discovery_query"], l["discovery_rank"],
            l["candidate_score"]) == ("provider-b", "query-b", 2, 0.25)


def test_duplicate_new_url_first_creates_rest_link(spark):
    # the Go loop's insert-race branch (:89-103): the second candidate
    # for a URL created moments ago links to it under the policy.
    sources = _sources(spark, [_src(10, "https://seen.test/")])
    out = persist_candidates(
        sources,
        _cands(spark, [_cand(0, "https://brand.new/", "n1"),
                       _cand(1, "https://brand.new/", "n2")]),
        seed_id=1,
    )
    audit = sorted(out["audit"].collect(), key=lambda r: r["cand_order"])
    assert [r["action"] for r in audit] == ["created", "linked"]
    assert audit[0]["source_id"] == audit[1]["source_id"] == 11
    created = {r["url"]: r for r in out["sources"].collect()}["https://brand.new/"]
    assert created["name"] == "n1"  # first candidate's fields stick


def test_normalize_source_url_query_decode(spark):
    # source.go:106-129: %2F/%3A decoded ONLY after the first '?'
    rows = spark.createDataFrame(
        [(" https://a.test/p%2Fx?u=%2Fpath%3A1 ",), ("https://a.test/p%2Fx",)],
        "u string",
    ).select(normalize_source_url(F.col("u")).alias("n")).collect()
    assert rows[0]["n"] == "https://a.test/p%2Fx?u=/path:1"
    assert rows[1]["n"] == "https://a.test/p%2Fx"


def test_created_url_duplicate_config_update_applies(spark):
    # Go's insert-race path updates the JUST-CREATED source's config
    # when a later duplicate carries a meaningful one
    # (source_upsert_policy.go:96-99) — the update set filters on
    # exists_like, not only pre-existing sources (ADVICE r5).
    sources = _sources(spark, [_src(10, "https://seen.test/")])
    cands = _cands(
        spark,
        [_cand(0, "https://brand.new/", "n1"),
         _cand(1, "https://brand.new/", "n2")],
    ).withColumn(
        "config_override",
        F.when(F.col("cand_order") == 1, F.lit('{"version":"new"}')),
    )
    out = persist_candidates(sources, cands, seed_id=1)
    audit = sorted(out["audit"].collect(), key=lambda r: r["cand_order"])
    assert [r["action"] for r in audit] == ["created", "linked_config_updated"]
    created = {r["url"]: r for r in out["sources"].collect()}["https://brand.new/"]
    # the created row reflects the later duplicate's config, while the
    # creator's other fields stick
    assert created["config"] == '{"version":"new"}'
    assert created["name"] == "n1"
