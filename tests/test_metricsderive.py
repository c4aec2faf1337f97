"""Observation derivation vs hand mirrors of the reference's rules
(information_seed_timeseries.go:69-330, time_series_hash.go:100-248).
"""

from __future__ import annotations

import hashlib
from datetime import datetime

from thecrowler_spark.operators.metricsderive import derive_observations

SCHEMA = ("event_id long, event string, identity string, scope string, "
          "observed_at timestamp, fields string")


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _framed_sha(*parts):
    return hashlib.sha256(
        "".join(f"{len(p)}:{p}|" for p in parts).encode()
    ).hexdigest()


def _dedupe(mid, identity, vhash, dims):
    return hashlib.sha256(
        f"information-seed\x00{mid}\x00{identity}\x00{vhash}\x00{dims}".encode()
    ).hexdigest()


def test_selector_match_value_and_hashes(spark):
    metrics = [{
        "metric_id": 7, "value_type": "count", "bucket": "1h",
        "selector": {"event": "Promoted", "where": {"decision.outcome": "kept"},
                     "provider": "rss_feed"},
        "dimensions": [{"key": "provider", "field": "provider"},
                       {"key": "kind", "value": "seed"}],
    }]
    rows = derive_observations(_events(spark, [
        (1, "promoted", "id-1", "s", _ts("2026-03-01 12:34:56"),
         '{"provider":"RSS_FEED","decision":{"outcome":" Kept "}}'),
        (2, "promoted", "id-2", "s", _ts("2026-03-01 12:40:00"),
         '{"provider":"rss_feed","decision":{"outcome":"dropped"}}'),
        (3, "rejected", "id-3", "s", _ts("2026-03-01 12:41:00"),
         '{"provider":"rss_feed","decision":{"outcome":"kept"}}'),
        (4, "promoted", "id-4", "s", _ts("2026-03-01 12:42:00"),
         '{"decision":{"outcome":"kept"}}'),  # provider key missing
    ]), metrics).collect()
    assert [r["event_id"] for r in rows] == [1]
    r = rows[0]
    assert r["value_int"] == 1 and r["value_type"] == "count"
    assert str(r["bucket_start"]) == "2026-03-01 12:00:00"
    assert str(r["bucket_end"]) == "2026-03-01 13:00:00"
    # dims sorted by key; normalized-match kept the RAW field value
    assert r["dimensions"] == '{"kind":"seed","provider":"RSS_FEED"}'
    vhash = _framed_sha("value", "count", "present:1")
    assert r["value_hash"] == vhash
    assert r["dedupe_key"] == _dedupe(7, "id-1", vhash, r["dimensions"])
    assert r["change_type"] == "new" and r["is_changed"]


def test_field_path_missing_skips_and_value_fallbacks(spark):
    metrics = [
        {"metric_id": 1, "value_type": "integer", "bucket": "none",
         "selector": {"field": "stats.count"}},
        {"metric_id": 2, "value_type": "string", "bucket": "none",
         "selector": {"value": "provider"}},  # string → field lookup
        {"metric_id": 3, "value_type": "string", "bucket": "none",
         "selector": {"value": "fixed-literal"}},
    ]
    rows = derive_observations(_events(spark, [
        (1, "e", "i", "s", _ts("2026-01-01 00:00:01"),
         '{"stats":{"count":"42"},"other":"x"}'),
        (2, "e", "i", "s", _ts("2026-01-01 00:00:02"), '{"no":"stats"}'),
    ]), metrics).collect()
    by = {(r["metric_id"], r["event_id"]): r for r in rows}
    assert (1, 1) in by and by[(1, 1)]["value_int"] == 42
    assert (1, 2) not in by  # missing path → no observation
    # metric 2: field 'provider' absent → the literal name itself
    assert by[(2, 1)]["value_text"] == "provider"
    assert by[(3, 2)]["value_text"] == "fixed-literal"
    assert str(by[(1, 1)]["bucket_start"]) == "2026-01-01 00:00:01"  # none


def test_integer_parse_error_is_audited_not_fatal(spark):
    metrics = [{"metric_id": 1, "value_type": "integer", "bucket": "1m",
                "selector": {"field": "n"}}]
    rows = derive_observations(_events(spark, [
        (1, "e", "i", "s", _ts("2026-01-01 00:00:00"), '{"n":"10"}'),
        (2, "e", "i", "s", _ts("2026-01-01 00:00:30"), '{"n":"oops"}'),
        (3, "e", "i", "s", _ts("2026-01-01 00:01:00"), '{"n":"11"}'),
    ]), metrics).collect()
    by = {r["event_id"]: r for r in rows}
    assert by[2]["change_type"] == "error" and by[2]["value_int"] is None
    # error rows never enter the change history: 10 → 11 is 'changed'
    assert by[1]["change_type"] == "new"
    assert by[3]["change_type"] == "changed"


def test_change_detection_per_dimension_combo_and_delta(spark):
    metrics = [{"metric_id": 9, "value_type": "decimal", "bucket": "1d",
                "selector": {"field": "score"},
                "dimensions": [{"key": "host", "field": "host"}]}]
    rows = derive_observations(_events(spark, [
        (1, "e", "i", "s", _ts("2026-02-01 01:00:00"), '{"score":"1.5","host":"a"}'),
        (2, "e", "i", "s", _ts("2026-02-01 02:00:00"), '{"score":"1.5","host":"a"}'),
        (3, "e", "i", "s", _ts("2026-02-01 03:00:00"), '{"score":"2.5","host":"a"}'),
        (4, "e", "i", "s", _ts("2026-02-01 04:00:00"), '{"score":"9.0","host":"b"}'),
    ]), metrics).collect()
    by = {r["event_id"]: r for r in rows}
    assert [by[k]["change_type"] for k in (1, 2, 3, 4)] == [
        "new", "unchanged", "changed", "new"]
    assert by[3]["change_delta_numeric"] == 1.0
    assert by[2]["prev_value_hash"] == by[1]["value_hash"]
    assert str(by[1]["bucket_start"]) == "2026-02-01 00:00:00"
    assert str(by[1]["bucket_end"]) == "2026-02-02 00:00:00"


def test_dimension_bounding_over_120_chars(spark):
    long = "x" * 121
    metrics = [{"metric_id": 1, "value_type": "count", "bucket": "1h",
                "selector": {},
                "dimensions": [{"key": "big", "field": "big"}]}]
    rows = derive_observations(_events(spark, [
        (1, "e", "i", "s", _ts("2026-01-01 00:00:00"), f'{{"big":"{long}"}}'),
    ]), metrics).collect()
    want = "sha256:" + hashlib.sha256(long.encode()).hexdigest()
    assert rows[0]["dimensions"] == f'{{"big":"{want}"}}'


def test_boolean_and_multi_metric_union(spark):
    metrics = [
        {"metric_id": 1, "value_type": "boolean", "bucket": "5m",
         "selector": {"field": "ok"}},
        {"metric_id": 2, "value_type": "count", "bucket": "5m",
         "selector": {"event": "fetched"}},
    ]
    rows = derive_observations(_events(spark, [
        (1, "fetched", "i", "s", _ts("2026-01-01 00:03:00"), '{"ok":"True"}'),
    ]), metrics).collect()
    by = {r["metric_id"]: r for r in rows}
    assert len(rows) == 2
    assert by[1]["value_int"] == 1
    assert by[1]["value_hash"] == _framed_sha("value", "boolean", "present:true")
    assert str(by[1]["bucket_start"]) == "2026-01-01 00:00:00"
    assert str(by[1]["bucket_end"]) == "2026-01-01 00:05:00"
