"""Attribute indexing — the reference's ObjectAttributes EAV extraction.

Reference: config-declared JSON paths are extracted from ``WebObjects.
details`` JSONB into ``ObjectAttributes(object_type, object_id,
attribute_key, attribute_value, normalized_value, value_hash sha256)``
(/root/reference/pkg/database/postgresql-setup.pgsql:553-601, extraction
/root/reference/pkg/crawler/crawler.go:1065-1202, path parsing
/root/reference/pkg/crawler/attribute_indexing.go:196-310). Entity
correlation is a self equi-join on ``value_hash``
(postgresql-setup.pgsql:613-656).

Spark rendering: each attribute spec is a ``get_json_object`` projection
+ normalizer chain + ``sha2(normalized, 256)``; the spec list unions
into one EAV DataFrame (a column-to-row unpivot that Catalyst folds into
a single scan via ``stack``-style projection union).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thecrowler_spark.functions.normalizers import apply_normalizers


@dataclass(frozen=True)
class AttributeSpec:
    """One config-declared attribute: where it comes from and how it is
    normalized (mirrors cfg.AttributeDefinition fields used by
    crawler.go:1065-1202)."""

    attribute_key: str
    json_path: str  # e.g. "$.product.price" (array tokens allowed)
    normalizers: tuple[str, ...] = field(default=("trim", "lowercase"))


def extract_attributes(
    objects: DataFrame,
    specs: list[AttributeSpec],
    object_type: str = "web_object",
    id_col: str = "object_id",
    details_col: str = "details",
) -> DataFrame:
    """details-JSON → EAV rows, one per (object, spec) with non-null value.

    Output schema matches ObjectAttributes:
    (object_type, object_id, attribute_key, attribute_value,
    normalized_value, value_hash).
    """
    parts = []
    for spec in specs:
        raw = F.get_json_object(F.col(details_col), spec.json_path)
        norm = apply_normalizers(raw, spec.normalizers)
        parts.append(
            objects.select(
                F.lit(object_type).alias("object_type"),
                F.col(id_col).alias("object_id"),
                F.lit(spec.attribute_key).alias("attribute_key"),
                raw.alias("attribute_value"),
                norm.alias("normalized_value"),
                F.sha2(norm, 256).alias("value_hash"),
            ).filter(F.col("attribute_value").isNotNull())
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def correlate_by_value(attrs: DataFrame) -> DataFrame:
    """Entity correlation: objects sharing a normalized value
    (postgresql-setup.pgsql:613-656). Self equi-join on value_hash —
    shuffle hash join on an already-uniform sha256 key, skew-free by
    construction."""
    a = attrs.alias("a")
    b = attrs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.value_hash") == F.col("b.value_hash"))
            & (F.col("a.object_id") < F.col("b.object_id")),
            "inner",
        )
        .select(
            F.col("a.object_id").alias("object_a"),
            F.col("b.object_id").alias("object_b"),
            F.col("a.attribute_key").alias("key_a"),
            F.col("b.attribute_key").alias("key_b"),
            F.col("a.value_hash").alias("value_hash"),
        )
    )
