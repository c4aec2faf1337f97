"""DSIR importance resampling: planted target-domain semantics and
fixed-point weight arithmetic (Xie et al. 2023 selection step)."""

from __future__ import annotations

import math

from thecrowler_spark.operators.dsir import (
    _w_int,
    dsir_select,
    fit_importance_weights,
    importance_scores,
)


def test_w_int_is_the_documented_rounding_rule():
    # floor(1e6*(ln((t+1)/(T+B)) - ln((r+1)/(R+B))) + 0.5), B=4
    got = _w_int(3, 10, 0, 20, 4)
    want = math.floor(1e6 * (math.log(4 / 14) - math.log(1 / 24)) + 0.5)
    assert got == want
    # symmetric: target-absent bucket scores negative
    assert _w_int(0, 10, 5, 20, 4) < 0


def test_dsir_ranks_target_like_doc_first(spark):
    target = spark.createDataFrame(
        [
            (1, "butter flour sugar oven bake whisk dough recipe knead proof"),
            (2, "bake the dough in the oven with butter sugar and flour today"),
            (3, "whisk sugar butter flour dough oven bake recipe rest chill"),
        ],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (10, "bake dough with butter and sugar in the oven then whisk"),
            (11, "quarterly revenue grew while margins compressed across regions"),
            (12, "the telescope resolved faint galaxies beyond the nebula cluster"),
            (13, "midfield pressing shaped the match until the late corner goal"),
            (14, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_select(spark, target, raw, k=5).collect()}
    assert out[10].rank == 1, out
    assert out[10].score > max(out[i].score for i in (11, 12, 13))
    # the empty doc has no features → no importance estimate → excluded
    # (its score 0 would otherwise outrank every negative real score)
    assert 14 not in out
    assert sorted(r.rank for r in out.values()) == [1, 2, 3, 4]

    # scores recompute exactly from the fitted weights; the zero-gram
    # doc still SCORES (0) — only selection excludes it
    weights, w0 = fit_importance_weights(spark, target, raw)
    rescored = {
        r.doc_id: r.score for r in importance_scores(raw, weights, w0).collect()
    }
    assert rescored[14] == 0
    assert all(rescored[d] == out[d].score for d in out)
