"""Span-parse goldens: Spark parse_documents vs the oracle transcription.

Checks the FIXTURES.md §6 golden surfaces: span-sequence passthrough,
links, title/summary fallback chains, body text, sorted keywords.
"""

from __future__ import annotations

from thecrowler_spark.functions.text import STOPWORDS_EN
from thecrowler_spark.operators.spans import parse_documents
from thecrowler_spark.sources.corpus import CorpusSpec, corpus_to_spark, small_corpus
from tests import oracle as O

SW = set(STOPWORDS_EN)


def test_span_parse_golden(spark):
    corpus = small_corpus(CorpusSpec(n_hosts=3, pages_per_host=15))
    dfs = corpus_to_spark(spark, corpus)
    parsed = {
        r["doc_id"]: r
        for r in parse_documents(dfs["documents"]).collect()
    }
    assert len(parsed) == len(corpus["documents"])

    for d in corpus["documents"]:
        doc_id, spans = d["doc_id"], d["spans"]
        row = parsed[doc_id]
        # span-sequence passthrough: (kind, text, media_ref, order) equality
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        want_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        assert got_spans == want_spans, f"{doc_id}: span passthrough"
        assert row["links"] == O.extract_links(spans), f"{doc_id}: links"
        assert row["title"] == O.o_title(spans), f"{doc_id}: title"
        assert row["summary"] == O.o_summary(spans), f"{doc_id}: summary"
        assert row["body_text"] == O.o_body_text(spans), f"{doc_id}: body"
        assert list(row["keywords"]) == O.o_keywords(spans, SW), f"{doc_id}: keywords"


def test_title_fallback_chain(spark):
    from pyspark.sql import functions as F

    from thecrowler_spark.sources.corpus import DOCUMENTS_SCHEMA

    def doc(doc_id, spans):
        return (doc_id, [(s.get("kind"), s.get("text", ""), s.get("media_ref", ""), i) for i, s in enumerate(spans)])

    rows = [
        doc("u1", [{"kind": "title", "text": "  The Title  "}, {"kind": "text", "text": "body"}]),
        doc("u2", [{"kind": "text", "text": "first text wins"}]),
        doc("u3", [{"kind": "meta", "text": "description a summary here"}]),
        doc("u4", [{"kind": "block"}]),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    got = {r["doc_id"]: (r["title"], r["summary"]) for r in parse_documents(df).collect()}
    assert got["u1"][0] == "The Title"
    assert got["u2"][0] == "first text wins"
    assert got["u3"] == ("a summary here", "a summary here")  # title ← summary[:255]
    assert got["u4"] == ("", "")
