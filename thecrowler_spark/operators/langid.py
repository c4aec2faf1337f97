"""Quality-path language identification: script pre-classifier +
trigram-profile scoring within the Latin AND Cyrillic scripts.

Mirrors the reference's whatlanggo pipeline
(/root/reference/pkg/crawler/web.go:3370-3401): detect the script
first, then score language profiles within it. The Latin branch —
where the 5-marker argmax confuses close pairs (cs/sk/sl/hr, es/pt/ca,
id/ms) and short texts — scores character trigrams against per-language
frequency-rank profiles shipped as a broadcast (trigram, lang, weight,
priority) table (functions/trigram.py); the Cyrillic branch (r5) does
the same over ru/uk/bg/sr/mk profiles (the marker argmax knew only 4
languages × 5 words and stays solely as the no-hit fallback). Both
scripts share ONE broadcast table — their trigram alphabets are
disjoint. Other scripts resolve via the same expressions as the
inline fast path (functions/text.py).

Scale shape (the part a 100 TB corpus cares about):
- trigram explosion is a narrow transform over the normalized doc head
  (≤ TRI_MAX_CHARS chars → ≤ ~400 trigrams/doc);
- the profile join is a BROADCAST (≈ TOP_N × n_langs ≈ 2.9k rows);
- per-(doc, lang) weight sums partial-aggregate map-side before the
  one doc-key shuffle; the argmax is a second tiny agg on the same
  doc key (no window, no sort);
- the winner joins back on the doc key. Non-Latin docs never enter
  the explode. No per-row Python anywhere.

Integer scores + dict-order priority tie-break ⇒ exact parity with the
DuckDB oracle generated from the same profile rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thecrowler_spark.functions import text as TX
from thecrowler_spark.functions import trigram as TRI


def profile_df(spark) -> DataFrame:
    """The broadcast profile table (tri, lang, w, prio) — Latin AND
    Cyrillic rows in ONE table: the two scripts' trigram alphabets are
    disjoint, so a document only ever scores against its own script's
    rows and a single broadcast join serves both branches."""
    return spark.createDataFrame(
        TRI.profile_rows("latin") + TRI.profile_rows("cyrillic"),
        "tri string, lang string, w int, prio int",
    )


def detect_language(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lang_pred",
) -> DataFrame:
    """df + ``out_col``: trigram-scored language per document.

    Latin- and Cyrillic-script docs: argmax over Σ profile-weight of
    each trigram occurrence (ties → earlier language in the script's
    seed order); Latin docs whose trigrams hit no profile →
    'unknown', Cyrillic no-hit docs fall back to the marker argmax
    (fallback 'ru' — the script is known, 'unknown' would discard
    information). Other scripts resolve via
    :func:`text.nonlatin_lang_expr` without entering the join.
    """
    spark = df.sparkSession
    tcol = F.col(text_col)
    base = df.withColumn("_script", TX.dominant_script(tcol)).withColumn(
        "_nl_pred",
        TX.nonlatin_lang_expr(tcol, F.col("_script"), include_cyrillic=False),
    ).withColumn(
        "_cyr_fb",
        F.when(F.col("_script") == "cyrillic", TX.cyrillic_marker_expr(tcol)),
    )
    tris = (
        base.filter(F.col("_script") == "latin")
        .select(id_col, F.explode(TRI.tri_array(tcol)).alias("tri"))
        .unionByName(
            base.filter(F.col("_script") == "cyrillic")
            .select(id_col, F.explode(TRI.tri_array(tcol, "cyrillic")).alias("tri"))
        )
    )
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
                F.col("_cyr_fb"),
                F.lit("unknown"),
            ),
        )
        .drop("_script", "_nl_pred", "_cyr_fb", "_tri_pred")
    )
