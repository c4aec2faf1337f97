"""Randomized cross-checks: Spark operators vs independent pure-Python
reference implementations over seeded random inputs (one Spark job per
test — the randomness lives in the input generator, not the runner).
A tiny vocabulary forces heavy gram/edge collisions, the regime where
positional bookkeeping bugs actually show up."""

from __future__ import annotations

import random
import re
from collections import Counter


def _ref_span_dedup(texts: dict[int, str], w: int):
    toks = {i: [t for t in re.split(r"\s+", s) if t] for i, s in texts.items()}
    cnt: Counter = Counter()
    for ts in toks.values():
        for p in range(len(ts) - w + 1):
            cnt[" ".join(ts[p : p + w])] += 1
    out = {}
    for i, ts in toks.items():
        covered: set[int] = set()
        for p in range(len(ts) - w + 1):
            if cnt[" ".join(ts[p : p + w])] > 1:
                covered.update(range(p, p + w))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def test_span_dedup_random_vs_reference(spark):
    from thecrowler_spark.operators.dedup import repeated_span_dedup

    rng = random.Random(1234)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 26)))
        for i in range(40)
    }
    w = 3
    want = _ref_span_dedup(texts, w)
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in repeated_span_dedup(docs, w=w, max_count=1).collect()
    }
    assert got == want


def _ref_components(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


def test_star_components_random_vs_union_find(spark):
    from thecrowler_spark.operators.dedup import connected_components_star

    rng = random.Random(99)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _ref_components(pairs)
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components_star(df).collect()}
    assert got == want
