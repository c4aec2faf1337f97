"""SemDeDup goldens (Abbas et al. 2023): planted near-twin pairs must
collapse to one survivor chosen by the paper's lowest-cosine-to-
centroid keep rule; far vectors survive untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thecrowler_spark.operators.similarity import semdedup


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 well-separated base directions in 8-d, plus a near-twin of
    # id 0 (one component nudged) and an exact copy of id 2
    rows = [
        (0, [1000.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1000.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1000.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (10, [1000.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # twin of 0
        (12, [0.0, 0.0, 1000.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # copy of 2
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_twins_collapse_far_vectors_survive(spark, corpus):
    out = {r.vec_id: r for r in semdedup(corpus, n_cells=3, eps=0.95).collect()}
    assert len(out) == 5
    # exactly one of each twin pair is dropped
    assert out[0].dropped != out[10].dropped
    assert out[2].dropped != out[12].dropped
    # the orthogonal singleton survives
    assert out[1].dropped is False
    # twins share a cell (they are near-identical)
    assert out[0].cell == out[10].cell
    assert out[2].cell == out[12].cell


def test_keep_rule_is_lowest_centroid_cosine_then_lower_id(spark, corpus):
    out = {r.vec_id: r for r in semdedup(corpus, n_cells=3, eps=0.95).collect()}
    for a, b in [(0, 10), (2, 12)]:
        ka, kb = out[a], out[b]
        kept = a if not ka.dropped else b
        other = b if kept == a else a
        if out[kept].cos_centroid != out[other].cos_centroid:
            assert out[kept].cos_centroid < out[other].cos_centroid
        else:
            assert kept < other  # tie -> lower id survives


def test_eps_dial(spark, corpus):
    # eps above the twin cosine -> nothing dropped
    out = {r.vec_id: r for r in semdedup(corpus, n_cells=3, eps=1.0000001).collect()}
    assert not any(r.dropped for r in out.values())
