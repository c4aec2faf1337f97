"""Deterministic synthetic crawl corpora (closed world, seed-pinned).

Two generators:

- :func:`small_corpus` — plain-Python rows (random.Random(seed)), shared
  verbatim with the pure-Python parity oracle in ``tests/oracle.py``.
- :func:`big_corpus_df` — a *distributed* generator: ``spark.range(n)``
  + pure Column arithmetic, no Python RNG, no driver materialization.
  This is the 10^10-scale path: the universe is a hash-defined function
  of the row index, so a 2M-doc or 10^10-doc corpus costs the same
  driver memory (zero).

Document shape is the BASELINE.json input_hint:
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
with span kinds per FIXTURES.md §1 (title/meta/text/block/link/image/blob).

The link graph is closed-world: every generated href is either another
doc_id in the corpus, a deliberate dead page (case-variant URL — the
fetch-error path), or a deliberately invalid URL (validity-filter path).
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.LongType()),
        T.StructField("source_uid", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("restricted", T.IntegerType()),
        T.StructField("disabled", T.BooleanType()),
        T.StructField("flags", T.IntegerType()),
        T.StructField("config", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

_VOCAB = (
    "crawler frontier spark shuffle partition politeness robots budget queue "
    "document span media image token index keyword search engine page link host "
    "domain depth level fetch parse hash bloom filter salt skew scale lake table "
    "snapshot merge checkpoint resume lineage metric round batch stream window"
).split()

_FILLER = "the and of to is a in that it for on with as at by from".split()

#: Deterministic non-Latin text slices: one sample per script-resolved
#: language of functions.text.detect_lang_expr. Used by the langid /
#: corpus-stats graded queries (injected over doc_id % 4 == 1 so ≥25%
#: of the graded corpus is non-Latin) and by pytest goldens. Dict order
#: matters: queries index into list(NONLATIN_SAMPLES) by doc_id.
NONLATIN_SAMPLES: dict[str, str] = {
    "zh": "这是一个测试文档 网络爬虫系统处理和分析数据",
    "ja": "これはテストです ウェブクローラーのデータ処理について",
    "ko": "이것은 테스트 문서입니다 웹 크롤러 데이터 처리",
    "ru": "это тестовый документ и не что как обработка данных",
    "uk": "це тестовий документ і що та як обробка даних",
    "ar": "هذه وثيقة اختبار لمعالجة البيانات",
    "hi": "यह एक परीक्षण दस्तावेज़ है डेटा प्रसंस्करण",
    "el": "αυτό είναι ένα δοκιμαστικό έγγραφο επεξεργασίας δεδομένων",
    "he": "זהו מסמך בדיקה לעיבוד נתונים",
    "th": "นี่คือเอกสารทดสอบการประมวลผลข้อมูล",
}


def host_name(h: int) -> str:
    return f"h{h}.example.com"


def page_url(h: int, p: int) -> str:
    return f"https://{host_name(h)}/p{p}"


@dataclass
class CorpusSpec:
    """Knobs for :func:`small_corpus`. Defaults ≈ FIXTURES.md t1 tier."""

    seed: int = 42
    n_hosts: int = 3
    pages_per_host: int = 40
    skew_host_factor: int = 4  # host 0 gets this many × pages_per_host
    links_per_page: tuple[int, int] = (2, 6)
    p_relative: float = 0.35
    p_trailing_slash: float = 0.15
    p_case_variant: float = 0.08  # dead fetch via case-sensitive doc_id
    p_cross_host: float = 0.15
    p_external_domain: float = 0.06
    p_invalid: float = 0.05
    p_private: float = 0.10  # robots-disallowed subtree /private/...
    p_image: float = 0.35
    p_media_doc: float = 0.05
    text_spans_per_page: tuple[int, int] = (2, 5)
    words_per_span: tuple[int, int] = (5, 18)
    private_pages_per_host: int = 6


def _pages_of_host(spec: CorpusSpec, h: int) -> int:
    return spec.pages_per_host * (spec.skew_host_factor if h == 0 else 1)


def small_corpus(spec: CorpusSpec | None = None) -> dict[str, Any]:
    """Generate the closed-world corpus as plain Python structures.

    Returns dict with keys: ``documents`` (list of (doc_id, spans) where
    spans are dicts), ``seeds``, ``robots_rules``, ``politeness_budgets``.
    Deterministic in ``spec.seed``.
    """
    spec = spec or CorpusSpec()
    rng = random.Random(spec.seed)
    docs: list[dict[str, Any]] = []

    def make_text(rng: random.Random) -> str:
        n = rng.randint(*spec.words_per_span)
        words = []
        for _ in range(n):
            words.append(rng.choice(_FILLER) if rng.random() < 0.4 else rng.choice(_VOCAB))
        return " ".join(words)

    all_pages: list[tuple[int, int, str]] = []  # (host, page, url)
    for h in range(spec.n_hosts):
        for p in range(_pages_of_host(spec, h)):
            all_pages.append((h, p, page_url(h, p)))
        for s in range(spec.private_pages_per_host):
            all_pages.append((h, -1 - s, f"https://{host_name(h)}/private/s{s}"))

    page_set = {u for _, _, u in all_pages}

    for h, p, url in all_pages:
        rng2 = random.Random(zlib.crc32(f"{spec.seed}|{url}".encode()) & 0x7FFFFFFF)
        spans: list[dict[str, Any]] = []
        off = 0

        def add(kind: str, text: str = "", media_ref: str = "") -> None:
            nonlocal off
            spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
            off += 1

        if rng2.random() < spec.p_media_doc and p > 0:
            add("blob", text="", media_ref=f"content://{url}")
            docs.append({"doc_id": url, "spans": spans})
            continue

        add("title", text=f"Page p{p} of {host_name(h)}")
        if rng2.random() < 0.5:
            add("meta", text="description " + make_text(rng2))
        if rng2.random() < 0.3:
            add("meta", text="keywords " + " ".join(rng2.sample(_VOCAB, 4)))

        n_text = rng2.randint(*spec.text_spans_per_page)
        n_links = rng2.randint(*spec.links_per_page)
        my_pages = _pages_of_host(spec, h)
        for i in range(max(n_text, n_links)):
            if i < n_text:
                add("text", text=make_text(rng2))
                add("block")
            if i < n_links:
                r = rng2.random()
                if r < spec.p_invalid:
                    href = rng2.choice(["", "   ", "http://", "ht tp://broken.example.com/x"])
                elif r < spec.p_invalid + spec.p_external_domain:
                    href = f"https://other{rng2.randint(0, 3)}.example.org/x{rng2.randint(0, 9)}"
                elif r < spec.p_invalid + spec.p_external_domain + spec.p_cross_host:
                    h2 = rng2.randrange(spec.n_hosts)
                    href = page_url(h2, rng2.randrange(_pages_of_host(spec, h2)))
                elif r < spec.p_invalid + spec.p_external_domain + spec.p_cross_host + spec.p_private:
                    href = f"/private/s{rng2.randrange(spec.private_pages_per_host)}"
                else:
                    tgt = rng2.randrange(my_pages)
                    rr = rng2.random()
                    if rr < spec.p_relative:
                        href = f"/p{tgt}"
                    elif rr < spec.p_relative + spec.p_trailing_slash:
                        href = page_url(h, tgt) + "/"
                    elif rr < spec.p_relative + spec.p_trailing_slash + spec.p_case_variant:
                        href = f"https://{host_name(h)}/P{tgt}"  # dead: case-sensitive fetch
                    else:
                        href = page_url(h, tgt)
                add("link", text=f"link {i}", media_ref=href)
            if i < n_links and rng2.random() < spec.p_image:
                add("image", text=f"alt {i}", media_ref=f"https://{host_name(h)}/img{i}.png")

        docs.append({"doc_id": url, "spans": spans})

    seeds = []
    from datetime import datetime, timezone

    for h in range(spec.n_hosts):
        seeds.append(
            {
                "source_id": h + 1,
                "source_uid": f"uid-{h}",
                "url": page_url(h, 0),
                "priority": ["high", "medium", "low"][h % 3],
                "status": "new",
                "restricted": 2,
                "disabled": False,
                "flags": 0,
                "config": "{}",
                "created_at": datetime(2026, 1, 1, 0, 0, h, tzinfo=timezone.utc),
            }
        )

    robots = []
    budgets = []
    for h in range(spec.n_hosts):
        robots.append({"host": host_name(h), "rule_type": "disallow", "path_prefix": "/private", "crawl_delay": None})
        robots.append({"host": host_name(h), "rule_type": "allow", "path_prefix": "/private/s0", "crawl_delay": None})
        budgets.append({"host": host_name(h), "max_fetches_per_round": 8, "interval_seconds": 3.0})

    return {
        "documents": docs,
        "seeds": seeds,
        "robots_rules": robots,
        "politeness_budgets": budgets,
        "page_set": page_set,
    }


def levels_corpus() -> dict[str, Any]:
    """Hand-authored multi-domain corpus grading ALL FIVE restriction
    levels through the full BFS (r4 VERDICT item 4): four hosts across
    two SLDs and two TLDs, five seeds at the SAME start URL with
    ``restricted`` 0..4. Reference semantics per level
    (``isExternalLink`` /root/reference/pkg/crawler/crawler.go:2131-2172):

    - 0: only the seed URL itself (and the source never enters the BFS
      loop, crawler.go:414);
    - 1: links string-prefixed by the source URL (the /p0 → /p05 →
      /p052 chain);
    - 2: same SLD (alpha-site.com: www + docs hosts);
    - 3: same TLD (.com: alpha + beta, NOT gamma .org);
    - 4: unrestricted (gamma too).

    Deterministic, RNG-free; includes a self-link (same-as-source
    skip), a trailing-slash dup, a case-variant dead fetch, an invalid
    href, and a 3-deep chain so ``max_depth=3`` is exercised.
    """
    A = "https://www.alpha-site.com"
    B = "https://docs.alpha-site.com"
    C = "https://www.beta-site.com"
    D = "https://www.gamma-site.org"
    pages: dict[str, list[str]] = {
        f"{A}/p0": ["/p05", f"{A}/p1", f"{B}/p0", f"{C}/p0", f"{D}/p0", f"{A}/p0", "   "],
        f"{A}/p05": [f"{A}/p052", f"{A}/p2", f"{C}/p1"],
        f"{A}/p052": [f"{A}/p1"],
        f"{A}/p1": [f"{B}/p1", f"{A}/p0/", f"{D}/p1"],
        f"{A}/p2": [f"{A}/P1", "ht tp://broken.example.com/x"],
        f"{B}/p0": [f"{A}/p2", f"{C}/p0"],
        f"{B}/p1": [f"{B}/p0", f"{B}/p2"],
        f"{B}/p2": [],
        f"{C}/p0": [f"{C}/p1", f"{D}/p0"],
        f"{C}/p1": [],
        f"{D}/p0": [f"{D}/p1"],
        f"{D}/p1": [],
    }
    docs = []
    for url, hrefs in pages.items():
        spans = [{"kind": "title", "text": f"Page {url}", "media_ref": "", "offset": 0}]
        for i, href in enumerate(hrefs):
            spans.append(
                {"kind": "link", "text": f"link {i}", "media_ref": href, "offset": i + 1}
            )
        docs.append({"doc_id": url, "spans": spans})

    from datetime import datetime, timezone

    seeds = [
        {
            "source_id": lvl + 1,
            "source_uid": f"uid-lvl{lvl}",
            "url": f"{A}/p0",
            "priority": "high",
            "status": "new",
            "restricted": lvl,
            "disabled": False,
            "flags": 0,
            "config": "{}",
            "created_at": datetime(2026, 1, 1, 0, 0, lvl, tzinfo=timezone.utc),
        }
        for lvl in range(5)
    ]
    hosts = ["www.alpha-site.com", "docs.alpha-site.com", "www.beta-site.com", "www.gamma-site.org"]
    robots = [
        {"host": h, "rule_type": "disallow", "path_prefix": "/private", "crawl_delay": None}
        for h in hosts
    ]
    budgets = [
        {"host": h, "max_fetches_per_round": 8, "interval_seconds": 3.0} for h in hosts
    ]
    return {
        "documents": docs,
        "seeds": seeds,
        "robots_rules": robots,
        "politeness_budgets": budgets,
        "page_set": set(pages),
    }


def dust_corpus() -> dict[str, Any]:
    """Hand-authored corpus for the DUST-valve crawl (operators/dust.py):
    query-param alias pages whose content proves which params are
    crawl-irrelevant. RNG-free, closed-world (every linked variant is a
    real doc so the mining log covers it).

    - ``d0.example.com`` — ``sid`` never changes content (4 witness
      groups: list?page=1/2, detail?id=7/8) → learned rule at
      min_support=2; ``page`` and ``id`` DO change content →
      contradictions veto them; ``ref`` is content-irrelevant but has
      only ONE witness group → support 1 < 2, no rule.
    - ``d1.example.com`` — ``sid`` selects different items →
      contradiction, no rule; both variants must be fetched.

    body_text = text+link span TEXTS (spans.py:66-71), so alias pairs
    keep link texts identical while their media_refs carry their own
    sid through to depth 2.
    """
    D0 = "https://d0.example.com"
    D1 = "https://d1.example.com"

    def texts(doc_text: str, links: list[tuple[str, str]]):
        spans = [{"kind": "title", "text": "t", "media_ref": "", "offset": 0},
                 {"kind": "text", "text": doc_text, "media_ref": "", "offset": 1}]
        for i, (t, href) in enumerate(links):
            spans.append({"kind": "link", "text": t, "media_ref": href, "offset": i + 2})
        return spans

    def list_page(page: int, sid: str):
        return texts(
            f"listing page {'one' if page == 1 else 'two'} of results",
            [("more 7", f"{D0}/detail?id=7&sid={sid}"),
             ("more 8", f"{D0}/detail?id=8&sid={sid}")],
        )

    docs = [
        {"doc_id": f"{D0}/start", "spans": texts("start hub for the dust crawl", [
            ("l1", f"{D0}/list?page=1&sid=aaa"),
            ("l2", f"{D0}/list?page=1&sid=bbb"),
            ("l3", f"{D0}/list?page=2&sid=aaa"),
            ("l4", f"{D0}/list?page=2&sid=bbb"),
            ("l5", f"{D1}/item?sid=1"),
            ("l6", f"{D1}/item?sid=2"),
            ("l7", f"{D0}/about?ref=x"),
            ("l8", f"{D0}/about?ref=y"),
            ("l9", f"{D0}/detail?id=7&sid=bbb"),
        ])},
        {"doc_id": f"{D0}/list?page=1&sid=aaa", "spans": list_page(1, "aaa")},
        {"doc_id": f"{D0}/list?page=1&sid=bbb", "spans": list_page(1, "bbb")},
        {"doc_id": f"{D0}/list?page=2&sid=aaa", "spans": list_page(2, "aaa")},
        {"doc_id": f"{D0}/list?page=2&sid=bbb", "spans": list_page(2, "bbb")},
        {"doc_id": f"{D0}/detail?id=7&sid=aaa", "spans": texts("detail seven body", [])},
        {"doc_id": f"{D0}/detail?id=7&sid=bbb", "spans": texts("detail seven body", [])},
        {"doc_id": f"{D0}/detail?id=8&sid=aaa", "spans": texts("detail eight body", [])},
        {"doc_id": f"{D0}/detail?id=8&sid=bbb", "spans": texts("detail eight body", [])},
        {"doc_id": f"{D0}/about?ref=x", "spans": texts("about this site", [])},
        {"doc_id": f"{D0}/about?ref=y", "spans": texts("about this site", [])},
        {"doc_id": f"{D1}/item?sid=1", "spans": texts("item one payload", [])},
        {"doc_id": f"{D1}/item?sid=2", "spans": texts("item two payload", [])},
    ]

    from datetime import datetime, timezone

    seeds = [{
        "source_id": 1,
        "source_uid": "uid-dust",
        "url": f"{D0}/start",
        "priority": "high",
        "status": "new",
        "restricted": 2,
        "disabled": False,
        "flags": 0,
        "config": "{}",
        "created_at": datetime(2026, 1, 1, tzinfo=timezone.utc),
    }]
    return {
        "documents": docs,
        "seeds": seeds,
        "robots_rules": [],
        "politeness_budgets": [],
        "page_set": {d["doc_id"] for d in docs},
    }


def corpus_to_spark(spark: SparkSession, corpus: dict[str, Any]) -> dict[str, DataFrame]:
    """Materialize the python corpus as Spark DataFrames (typed schemas)."""
    docs_rows = [
        (d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
        for d in corpus["documents"]
    ]
    documents = spark.createDataFrame(docs_rows, DOCUMENTS_SCHEMA)
    seeds = spark.createDataFrame(
        [tuple(s.values()) for s in corpus["seeds"]], SEEDS_SCHEMA
    )
    robots = spark.createDataFrame(
        [(r["host"], r["rule_type"], r["path_prefix"], r["crawl_delay"]) for r in corpus["robots_rules"]],
        "host string, rule_type string, path_prefix string, crawl_delay double",
    )
    budgets = spark.createDataFrame(
        [(b["host"], b["max_fetches_per_round"], b["interval_seconds"]) for b in corpus["politeness_budgets"]],
        "host string, max_fetches_per_round int, interval_seconds double",
    )
    return {"documents": documents, "seeds": seeds, "robots_rules": robots, "politeness_budgets": budgets}


def big_corpus_df(
    spark: SparkSession,
    n_docs: int,
    n_hosts: int = 1000,
    links_per_page: int = 8,
    skew_pct_host0: float = 0.2,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed hash-defined corpus: no driver data, scales to any n.

    Host assignment is skewed on purpose: ``skew_pct_host0`` of all docs
    land on host 0 (the mega-host that breaks naive host-partitioning);
    the rest spread uniformly. Link targets are modular arithmetic over
    the same id space, so the graph is closed-world by construction.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n_docs, 1, partitions)
    skew_cut = int(n_docs * skew_pct_host0)
    host_id = F.when(F.col("id") < skew_cut, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_hosts - 1)) + 1
    )
    df = df.withColumn("host_id", host_id)
    # page index within host: id itself is unique; use it directly
    url = F.concat(F.lit("https://h"), F.col("host_id").cast("string"), F.lit(".example.com/p"), F.col("id").cast("string"))

    # deterministic link targets: k hash-derived ids, mapped back to urls
    def target(k: int):
        tid = F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(n_docs))
        thost = F.when(tid < skew_cut, F.lit(0)).otherwise(F.pmod(F.xxhash64(tid), F.lit(n_hosts - 1)) + 1)
        return F.concat(F.lit("https://h"), thost.cast("string"), F.lit(".example.com/p"), tid.cast("string"))

    spans = F.array(
        F.struct(
            F.lit("title").alias("kind"),
            F.concat(F.lit("Doc "), F.col("id").cast("string")).alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit("the quick crawler indexes document "), F.col("id").cast("string"), F.lit(" with spark and shuffle")).alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(1).cast("int").alias("offset"),
        ),
        *[
            F.struct(
                F.lit("link").alias("kind"),
                F.lit(f"link {k}").alias("text"),
                target(k).alias("media_ref"),
                F.lit(2 + k).cast("int").alias("offset"),
            )
            for k in range(links_per_page)
        ],
    )
    return df.select(url.alias("doc_id"), spans.alias("spans"))


def big_documents_df(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 5000,
    partitions: int | None = None,
) -> DataFrame:
    """Hash-defined (doc_id, text) corpus for the pipeline bench lane:
    no driver data, scales to any n, and every pipeline stage gets real
    work by construction:

    - ~4% EXACT duplicates: ids with ``xxhash64(id) % 25 == 0`` reuse
      the content seed of a doc in the first 10% of the id space.
    - ~4% NEAR duplicates: ``% 25 == 1`` reuse a seed but append a
      one-word twist (MinHash-LSH + Jaccard-verify work).
    - every doc ends with the same boilerplate line, and docs on the
      same seed-group share a second semi-hot line (CCNet line-dedup
      work; the global line's count always exceeds ``max_count``).
    - body = 4 lines × 12-24 hash-words over a ``vocab``-word
      vocabulary: ≥ 48 tokens, high 2-gram diversity → most docs PASS
      the Gopher screens, so downstream stages see realistic volume.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n_docs, 1, partitions)
    bucket = F.pmod(F.xxhash64("id"), F.lit(25))
    base = F.greatest(F.lit(1), F.lit(max(n_docs // 10, 1)))
    seed = (
        F.when(bucket < 2, F.pmod(F.xxhash64("id", F.lit(7)), base))
        .otherwise(F.col("id"))
        .alias("seed")
    )
    df = df.select("id", seed, bucket.alias("_b"))

    def line(k: int) -> Column:
        n_words = F.lit(12) + F.pmod(F.xxhash64("seed", F.lit(k)), F.lit(13))
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), n_words),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("seed"), F.lit(k), i), F.lit(vocab)).cast("string"),
                ),
            ),
        )

    body = F.concat_ws("\n", line(1), line(2), line(3), line(4))
    twist = F.when(
        F.col("_b") == 1,
        F.concat(F.lit("\nvariant token v"), F.col("id").cast("string")),
    ).otherwise(F.lit(""))
    groupline = F.concat(
        F.lit("shared group heading number "),
        F.pmod(F.col("seed"), F.lit(max(n_docs // 500, 1))).cast("string"),
    )
    boiler = F.lit("all rights reserved example corp contact terms of service")
    text = F.concat_ws("\n", groupline, F.concat(body, twist), boiler)
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))
