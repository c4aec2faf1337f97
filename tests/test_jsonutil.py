"""Canonical-JSON + content-hash goldens (json_normalization.go:33-104,
crawler.go:1504-1520)."""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import functions as F

from thecrowler_spark.functions.jsonutil import canonical_json, content_identity_hash


def test_canonical_json_sorts_and_compacts(spark):
    df = spark.createDataFrame(
        [
            ('{"b": 1, "a": {"z": true, "y": null}}',),
            ('  [3, 2, {"k": "v"}]  ',),
            ("not json",),
            ("",),
            (None,),
        ],
        "v string",
    )
    got = [r["c"] for r in df.select(canonical_json(F.col("v")).alias("c")).collect()]
    assert got[0] == '{"a":{"y":null,"z":true},"b":1}'
    assert got[1] == '[3,2,{"k":"v"}]'
    assert got[2] == "not json"  # passthrough, like normalizeJSON on invalid
    assert got[3] == ""
    assert got[4] is None


def test_content_identity_hash_matches_reference_composition(spark):
    body = "page body text"
    scraped = '{"b": 2, "a": 1}'
    tech = '{"server": "nginx"}'
    expect = hashlib.sha256(
        body.encode()
        + json.dumps(json.loads(scraped), sort_keys=True, separators=(",", ":")).encode()
        + json.dumps(json.loads(tech), sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()
    df = spark.createDataFrame([(body, scraped, tech)], "b string, s string, t string")
    got = df.select(
        content_identity_hash(F.col("b"), F.col("s"), F.col("t")).alias("h")
    ).first()["h"]
    assert got == expect
    # key order in the input JSON must NOT change the hash
    df2 = spark.createDataFrame([(body, '{"a": 1, "b": 2}', tech)], "b string, s string, t string")
    got2 = df2.select(
        content_identity_hash(F.col("b"), F.col("s"), F.col("t")).alias("h")
    ).first()["h"]
    assert got2 == expect


def test_xml_to_json_shape(spark):
    from thecrowler_spark.functions.jsonutil import xml_to_json

    xml = '<root id="1"><item>a</item><item k="2">b</item><single>c</single></root>'
    df = spark.createDataFrame([(xml,), ("<bad", ), (None,)], "v string")
    got = [r["j"] for r in df.select(xml_to_json(F.col("v")).alias("j")).collect()]
    obj = json.loads(got[0])
    # {Root: {...}} wrapper, @attr keys, #text, auto-array on dup names
    assert obj["root"]["@id"] == "1"
    assert isinstance(obj["root"]["item"], list) and len(obj["root"]["item"]) == 2
    assert obj["root"]["item"][0]["#text"] == "a"
    assert obj["root"]["item"][1]["@k"] == "2"
    assert obj["root"]["single"]["#text"] == "c"
    assert got[1] is None and got[2] is None
