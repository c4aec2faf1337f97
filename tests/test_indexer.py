"""Index-sink star tests: build, MERGE idempotence, keep-old-if-blank.

Reference: indexPage TX (crawler.go:943-1063), SearchIndex upsert
COALESCE semantics (crawler.go:1343-1349), WebObjects hash dedup
(crawler.go:1504-1543)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.operators.indexer import (
    build_index_tables,
    merge_search_index_keep_old_if_blank,
    write_index_star,
)
from thecrowler_spark.operators.spans import parse_documents
from thecrowler_spark.sources.lake import LakeTable

SPAN = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _docs(spark, rows):
    return spark.createDataFrame(rows, f"doc_id string, spans {SPAN}")


def _page(url, title, body, metas=()):
    spans = [("title", title, "", 0), ("text", body, "", 1)]
    for i, (n, c) in enumerate(metas):
        spans.append(("meta", f"{n} {c}", "", 2 + i))
    return (url, spans)


def test_build_index_star_shapes(spark):
    docs = _docs(
        spark,
        [
            _page("https://a.example.com/1", "Page One", "alpha beta gamma alpha", [("keywords", "alpha, delta")]),
            _page("https://a.example.com/2", "Page Two", "alpha beta gamma alpha"),  # same body
        ],
    )
    t = build_index_tables(parse_documents(docs))
    assert t["search_index"].count() == 2
    assert t["web_objects"].count() == 1  # same content hash dedups
    assert t["web_objects_index"].count() == 2  # both pages bridge to it
    assert {r["name"] for r in t["meta_tags"].collect()} == {"keywords"}
    ki = {(r["index_id"][:6], r["keyword"]): r["occurrences"] for r in t["keyword_index"].collect()}
    assert all(k in {r["keyword"] for r in t["keywords"].collect()} for _, k in ki)


def test_write_star_idempotent(spark, tmp_path):
    docs = _docs(spark, [_page("https://a.example.com/1", "T", "alpha beta gamma")])
    tables = build_index_tables(parse_documents(docs))
    d = str(tmp_path / "lake")
    write_index_star(spark, d, tables)
    counts1 = {n: LakeTable(spark, f"{d}/{n}").read().count() for n in tables}
    write_index_star(spark, d, tables)  # replay the same batch
    counts2 = {n: LakeTable(spark, f"{d}/{n}").read().count() for n in tables}
    assert counts1 == counts2  # exactly-once analog: replays are no-ops


def test_keep_old_if_blank(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "si"))
    first = _docs(spark, [_page("https://a.example.com/1", "Real Title", "alpha beta gamma")])
    merge_search_index_keep_old_if_blank(
        lake, build_index_tables(parse_documents(first))["search_index"]
    )
    # refresh with blank title must keep the old one (crawler.go:1343-1349)
    blank = build_index_tables(parse_documents(first))["search_index"].withColumn(
        "title", F.lit("   ")
    )
    merge_search_index_keep_old_if_blank(lake, blank)
    row = lake.read().first()
    assert row["title"] == "Real Title"
    # refresh with a new non-blank title replaces it
    renamed = build_index_tables(parse_documents(first))["search_index"].withColumn(
        "title", F.lit("New Title")
    )
    merge_search_index_keep_old_if_blank(lake, renamed)
    assert lake.read().first()["title"] == "New Title"
    assert lake.read().count() == 1


def test_netinfo_screenshot_sinks(spark, tmp_path):
    from thecrowler_spark.operators.netinfo import (
        netinfo_rows,
        screenshot_rows,
        write_netinfo,
        write_screenshots,
    )
    from thecrowler_spark.sources.lake import LakeTable

    pages = spark.createDataFrame(
        [("https://a.example.com/1", '{"b": 1, "a": 2}'), ("https://a.example.com/2", '{"a": 2, "b": 1}')],
        "doc_id string, details string",
    )
    net = netinfo_rows(pages)
    rows = net.collect()
    # canonical JSON → identical details/hash despite key-order difference
    assert rows[0]["details"] == rows[1]["details"] == '{"a":2,"b":1}'
    assert rows[0]["details_hash"] == rows[1]["details_hash"]

    d = str(tmp_path / "lake")
    write_netinfo(spark, d, net)
    write_netinfo(spark, d, net)  # replay → idempotent
    assert LakeTable(spark, f"{d}/net_info").read().count() == 2  # one per page

    shots = screenshot_rows(pages)
    write_screenshots(spark, d, shots)
    write_screenshots(spark, d, shots)
    got = LakeTable(spark, f"{d}/screenshots").read()
    assert got.count() == 2
    assert got.first()["screenshot_ref"].endswith(".png")


def test_index_star_detected_tech_table(spark):
    """tech_rules adds the detected_tech star table: PageInfo.DetectedTech
    stored with the index row (web.go:1017)."""
    from thecrowler_spark.operators.detection import tech_rules_df

    docs = _docs(
        spark,
        [
            _page(
                "https://b.example.com/wp",
                "Blog",
                'intro <script src="/wp-content/t/x.js"></script> jquery.min.js',
                [("generator", "WordPress 6.4.2")],
            ),
            _page("https://b.example.com/plain", "Plain", "nothing to see"),
        ],
    )
    t = build_index_tables(parse_documents(docs), tech_rules=tech_rules_df(spark))
    det = {(r["index_id"][:8], r["entity_name"]): r for r in t["detected_tech"].collect()}
    names = {n for _, n in det}
    # WordPress via body+meta; implied PHP/MySQL; jQuery via body;
    # no_CSP on both pages (span pages carry no headers)
    assert {"WordPress", "PHP", "MySQL", "jQuery", "JavaScript", "no_CSP"} <= names
    wp = [v for (_, n), v in det.items() if n == "WordPress"][0]
    assert wp["entity_type"] == "meta_tags,html"
