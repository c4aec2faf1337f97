"""Quality-path language identification: script pre-classifier +
trigram-profile scoring within the multi-language scripts.

Mirrors the reference's whatlanggo pipeline
(/root/reference/pkg/crawler/web.go:3370-3401): detect the script
first, then score language profiles within it. Four scripts are
multi-language and get trigram scoring — Latin (where the 5-marker
argmax confuses close pairs cs/sk/sl/hr, es/pt/ca, id/ms), Cyrillic
(ru/uk/bg/sr/mk), Arabic (ar/fa/ur — the script-only dispatch can
only ever say 'ar') and Devanagari (hi/mr/ne, likewise 'hi'-only).
Profiles ship as ONE broadcast (trigram, lang, weight, priority)
table (functions/trigram.py) — the four scripts' trigram alphabets
are pairwise disjoint, so a document only ever scores against its own
script's rows. Other scripts resolve via the same expressions as the
inline fast path (functions/text.py).

Per-script no-hit fallbacks keep the pre-trigram semantics: Cyrillic →
the 4-language marker argmax (fallback 'ru'), Arabic → 'ar',
Devanagari → 'hi', Latin → 'unknown'.

Scale shape (the part a 100 TB corpus cares about):
- trigram explosion is a narrow transform over the normalized doc head
  (≤ TRI_MAX_CHARS chars → ≤ ~400 trigrams/doc);
- the profile join is a BROADCAST (≈ TOP_N × n_langs ≈ 4.2k rows);
- per-(doc, lang) weight sums partial-aggregate map-side before the
  one doc-key shuffle; the argmax is a second tiny agg on the same
  doc key (no window, no sort);
- the winner joins back on the doc key. Single-language-script docs
  never enter the explode. No per-row Python anywhere.

Integer scores + dict-order priority tie-break ⇒ exact parity with the
DuckDB oracle generated from the same profile rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thecrowler_spark.functions import text as TX
from thecrowler_spark.functions import trigram as TRI

#: scripts scored with trigram profiles, in seed-registry order.
TRI_SCRIPTS: tuple[str, ...] = ("latin", "cyrillic", "arabic", "devanagari")


def profile_df(spark) -> DataFrame:
    """The broadcast profile table (tri, lang, w, prio) — all trigram
    scripts' rows in ONE table: their trigram alphabets are pairwise
    disjoint, so a document only ever scores against its own script's
    rows and a single broadcast join serves every branch."""
    rows: list = []
    for script in TRI_SCRIPTS:
        rows.extend(TRI.profile_rows(script))
    return spark.createDataFrame(rows, "tri string, lang string, w int, prio int")


def _script_fallback(tcol, script) -> "F.Column":
    """No-hit fallback per trigram script (NULL for Latin — its
    fallback is the literal 'unknown' at the end of the coalesce)."""
    return (
        F.when(script == "cyrillic", TX.cyrillic_marker_expr(tcol))
        .when(script == "arabic", F.lit("ar"))
        .when(script == "devanagari", F.lit("hi"))
    )


def detect_language(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lang_pred",
) -> DataFrame:
    """df + ``out_col``: trigram-scored language per document.

    Docs in a trigram script (TRI_SCRIPTS): argmax over Σ
    profile-weight of each trigram occurrence (ties → earlier language
    in the script's seed order); no-hit docs fall back per script
    (Cyrillic → marker argmax → 'ru', Arabic → 'ar', Devanagari →
    'hi', Latin → 'unknown' — the script is known, so discarding it
    would lose information). Other scripts resolve via
    :func:`text.nonlatin_lang_expr` without entering the join.
    """
    spark = df.sparkSession
    tcol = F.col(text_col)
    non_latin_tri = tuple(s for s in TRI_SCRIPTS if s != "latin")
    base = df.withColumn("_script", TX.dominant_script(tcol)).withColumn(
        "_nl_pred",
        TX.nonlatin_lang_expr(tcol, F.col("_script"), trigram_scripts=non_latin_tri),
    ).withColumn("_fb", _script_fallback(tcol, F.col("_script")))
    # ONE script-dispatched explode, not a union of per-script filtered
    # legs: a 4-leg union + the winner join-back would reference (and
    # re-render) the caller's full upstream plan 5×, which both
    # recomputes deep lineage per leg and blows up AQE's per-stage plan
    # strings (driver explainString OOM observed at pipeline stage 6).
    # The CASE keeps exactly the old semantics: a doc only ever gets its
    # own script's trigrams; non-trigram scripts get an empty array and
    # vanish in the explode.
    dispatched = None
    empty = F.array().cast("array<string>")
    for script in TRI_SCRIPTS:
        leg = TRI.tri_array(tcol, script)
        cond = F.col("_script") == script
        dispatched = F.when(cond, leg) if dispatched is None else dispatched.when(cond, leg)
    tris = base.select(id_col, F.explode(dispatched.otherwise(empty)).alias("tri"))
    scores = (
        tris.join(F.broadcast(profile_df(spark)), "tri")
        .groupBy(id_col, "lang", "prio")
        .agg(F.sum("w").alias("score"))
    )
    best = scores.groupBy(id_col).agg(
        F.max(F.struct("score", "prio", "lang"))["lang"].alias("_tri_pred")
    )
    return (
        base.join(best, id_col, "left")
        .withColumn(
            out_col,
            F.coalesce(
                F.col("_nl_pred"),
                F.col("_tri_pred"),
                F.col("_fb"),
                F.lit("unknown"),
            ),
        )
        .drop("_script", "_nl_pred", "_fb", "_tri_pred")
    )
