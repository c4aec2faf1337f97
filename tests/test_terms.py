"""Term-statistics operators: TF-IDF ordering, repetition signals,
Gopher-style quality verdict, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from thecrowler_spark.functions import text as TX
from thecrowler_spark.operators import terms as TM


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_repetition_signals_exact(spark):
    docs = _docs(
        spark,
        [
            "spam spam spam spam",          # 3 bigrams, all "spam spam"
            "one two three four",           # 3 bigrams, all distinct
            "word",                          # 1 token -> single whole-doc gram
            "",                              # empty -> zeros
        ],
    )
    rows = {r.doc_id: r for r in TM.repetition_profile(docs).collect()}
    assert (rows[0].n_ngrams, rows[0].n_distinct, rows[0].top_count) == (3, 1, 3)
    assert (rows[1].n_ngrams, rows[1].n_distinct, rows[1].top_count) == (3, 3, 1)
    assert (rows[2].n_ngrams, rows[2].n_distinct, rows[2].top_count) == (1, 1, 1)
    assert (rows[3].n_ngrams, rows[3].n_distinct, rows[3].top_count) == (0, 0, 0)


def test_quality_filter_rules(spark):
    long_ok = " ".join(f"tok{i}" for i in range(50))
    too_short = "just a few words here"
    repetitive = " ".join(["buy now"] * 40)  # top bigram dominates
    docs = _docs(spark, [long_ok, too_short, repetitive])
    got = {r.doc_id: r.keep for r in TM.quality_filter_verdict(docs).collect()}
    assert got[0] is True
    assert got[1] is False  # below min_tokens
    assert got[2] is False  # top-gram fraction too high


def test_tfidf_ordering_prefers_rare_terms(spark):
    # 'rare' appears twice in doc 0 only; 'common' appears in every doc.
    docs = _docs(
        spark,
        [
            "rare rare common word alpha",
            "common word beta gamma",
            "common word delta epsilon",
        ],
    )
    top = TM.tfidf_top_terms(docs, k=2)
    d0 = {r.rank: r for r in top.filter(F.col("doc_id") == 0).collect()}
    assert d0[1].term == "rare" and d0[1].tf == 2 and d0[1].df == 1
    # rank 2: tf=1 tie -> lowest df wins, then term asc; 'alpha' (df=1)
    assert d0[2].term == "alpha"
    # every doc gets exactly k ranks (enough distinct terms present)
    counts = top.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in counts)


def test_pii_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.com or 192.168.0.1 call +1 (555) 010-9999 ok"),
            (2, "no pii here, just 1.2 numbers and an at sign @ alone"),
        ],
        "id long, txt string",
    )
    counts = TX.pii_counts(F.col("txt"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            TX.redact_pii(F.col("txt")).alias("red"),
            *[c.alias(f"n_{k}") for k, c in counts.items()],
        ).collect()
    }
    assert out[1].red == "mail <EMAIL> or <IP> call <PHONE> ok"
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 1, 1)
    assert out[2].red == "no pii here, just 1.2 numbers and an at sign @ alone"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 0)
    # '1.2' must not be eaten by the IPv4 rule
    assert "1.2 numbers" in out[2].red


def test_dedup_lines_removes_boilerplate(spark):
    from thecrowler_spark.operators import dedup as DD

    rows = []
    for i in range(6):
        rows.append((i, f"COOKIE BANNER\nunique body {i}\nfooter shared"))
    # footer appears 6x, banner 6x -> removed at max_count=4; body kept
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in DD.dedup_lines(docs, max_count=4).collect()}
    for i in range(6):
        assert out[i].text_dedup == f"unique body {i}"
        assert out[i].n_lines == 3 and out[i].n_kept == 1
    # all-boilerplate doc -> empty result, still present
    docs2 = spark.createDataFrame(
        [(i, "same line\nsame line two") for i in range(5)] + [(99, "keep me")],
        "doc_id long, text string",
    )
    out2 = {r.doc_id: r for r in DD.dedup_lines(docs2, max_count=4).collect()}
    assert out2[0].text_dedup == "" and out2[0].n_kept == 0
    assert out2[99].text_dedup == "keep me"


def test_line_counts_occurrence_semantics(spark):
    from thecrowler_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(1, "dup\ndup\nsolo a"), (2, "dup\nsolo b\n  \n")],
        "doc_id long, text string",
    )
    got = {r.line: r.n_occurrences for r in DD.line_counts(docs).collect()}
    # occurrence counts (in-doc repeats counted), blank lines dropped
    assert got == {"dup": 3, "solo a": 1, "solo b": 1}


def test_winnow_guarantee_and_edges(spark):
    """Winnowing guarantee: docs sharing a >= w+k-1 (=6) token run share
    at least one fingerprint; disjoint docs share none; short docs."""
    from pyspark.sql import functions as F

    from thecrowler_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} trailing tail tokens"),
            (2, f"{shared} completely different ending text"),
            (3, "nothing in common with the others at all whatsoever"),
            (4, "tiny doc"),          # < k tokens -> empty
            (5, "one two three"),     # exactly k -> single gram -> one fp
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=3, w=4).alias("fps")
        ).collect()
    }
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    assert fps[4] == set()
    assert len(fps[5]) == 1


def test_script_aware_langid_goldens(spark):
    """Script pre-classifier: every NONLATIN_SAMPLES slice resolves to
    its language; Latin marker argmax unchanged; digits-only text is
    'unknown'; mixed Han+kana resolves ja (kana wins inside CJK)."""
    from pyspark.sql import functions as F

    from thecrowler_spark.functions import text as TX
    from thecrowler_spark.sources.corpus import NONLATIN_SAMPLES

    rows = [(k, v) for k, v in NONLATIN_SAMPLES.items()]
    rows += [
        ("en", "the quick brown fox is one of the best"),
        ("de", "der hund und die katze ist das beste"),
        ("unknown", "12345 67890 --- !!!"),
        ("ja", "日本語のテキスト処理"),          # Han + katakana → ja
        ("zh", "中文文本处理系统"),              # Han only → zh
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = df.select("lang", TX.detect_lang_expr(F.col("text")).alias("pred")).collect()
    bad = [(r["lang"], r["pred"]) for r in out if r["lang"] != r["pred"]]
    assert not bad, bad
