"""Multimodal column plumbing: binary payloads + typed metadata.

Media objects ride as opaque ``binary`` columns with typed metadata —
the Spark rendering of the reference's WebObjects blob store
(/root/reference/pkg/crawler/crawler.go:1504-1543, content typing
pkg/crawler/types.go:324-413). The decode/feature-extract step is a
STUB (image/audio libs are not in this container): the Spark-side
plumbing — schema, ``mapInPandas`` batch shape, partitioning — is real
and tested; ``decode_image_batch`` computes deterministic fake features
(size, sha256, fake dims) and raises ``NotImplementedError`` only if a
real decode is requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: extension → media type, per the reference docTypeMap
#: (/root/reference/pkg/crawler/types.go:324-413, subset).
EXT_TYPE_MAP = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "webp": "image/webp",
    "mp3": "audio/mpeg",
    "wav": "audio/wav",
    "mp4": "video/mp4",
    "webm": "video/webm",
    "pdf": "application/pdf",
    "zip": "application/zip",
}

DECODED_SCHEMA = (
    "media_ref string, media_type string, n_bytes long, payload_sha256 string, "
    "fake_width int, fake_height int"
)


def media_type_expr(ref_col) -> F.Column:
    """Extension-map content typing as a CASE chain (P10) — JVM-side."""
    ext = F.lower(F.substring_index(F.substring_index(ref_col, "?", 1), ".", -1))
    expr = F.lit("application/octet-stream")
    # build reversed when-chain
    chain = F.when(F.lit(False), F.lit(""))
    for k, v in EXT_TYPE_MAP.items():
        chain = chain.when(ext == k, F.lit(v))
    return chain.otherwise(expr)


def attach_payloads(media_refs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Synthesize deterministic binary payloads for media refs.

    Real pipelines read blobs from object storage; here payload =
    utf-8 of the ref repeated by a hash-derived factor — deterministic
    and unique per ref, exercising real binary-column plumbing.
    """
    # md5-derived repetition factor: portable (DuckDB mirrors it exactly)
    rep = (F.pmod(F.ascii(F.substring(F.md5(F.col(ref_col)), 1, 1)), F.lit(8)) + 1).cast("int")
    payload = F.encode(F.repeat(F.col(ref_col), rep), "utf-8")
    return media_refs.withColumn("payload", payload).withColumn(
        "media_type", media_type_expr(F.col(ref_col))
    )


def decode_media(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    The batch shape and schema are the production contract; the decode
    body is a deterministic stub. ``real_decode=True`` raises
    NotImplementedError (no image/audio libs in this container).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "real image/audio decode requires pillow/libav — not in this container"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            sha = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            fake_w = (n_bytes % 640 + 1).astype("int32")
            fake_h = (n_bytes % 480 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "payload_sha256": sha,
                    "fake_width": fake_w,
                    "fake_height": fake_h,
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


def media_spans_table(documents: DataFrame) -> DataFrame:
    """All media refs in the corpus: explode image/media/blob spans."""
    s = F.filter(F.col("spans"), lambda x: x["kind"].isin("image", "media", "blob"))
    return (
        documents.select(F.col("doc_id"), F.explode(s).alias("sp"))
        .select(
            "doc_id",
            F.col("sp.kind").alias("kind"),
            F.col("sp.media_ref").alias("media_ref"),
            F.col("sp.offset").alias("offset"),
        )
        .filter(F.col("media_ref") != "")
    )


RESIZED_SCHEMA = (
    "media_ref string, media_type string, target_w int, target_h int, "
    "resized_sha256 string, n_bytes long"
)

FRAMES_SCHEMA = (
    "media_ref string, frame_idx int, frame_ts_ms long, frame_sha256 string"
)


def resize_media(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize plumbing over mapInPandas (Arrow batches).

    Schema/batch contract is production-real; the pixel work is a
    deterministic stub (this container has no pillow/libav): the
    "resized" payload is payload + dims, hashed. Swapping in a real
    decoder changes only the body of ``batches``.
    """
    from collections.abc import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            tag = f":{target_w}x{target_h}".encode()
            sha = pdf["payload"].map(lambda b: hashlib.sha256(bytes(b) + tag).hexdigest())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized_sha256": sha,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video refs: one output row per sampled
    frame (frame count derived deterministically from the payload size —
    a stand-in for real container parsing; the fan-out shape, schema and
    per-frame hashing are the production contract)."""
    from collections.abc import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            refs, idxs, tss, hashes = [], [], [], []
            for ref, payload, mtype in zip(pdf["media_ref"], pdf["payload"], pdf["media_type"]):
                if not str(mtype).startswith("video/"):
                    continue
                n = min((len(payload) % max_frames) + 1, max_frames)
                for i in range(n):
                    refs.append(ref)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    hashes.append(
                        hashlib.sha256(bytes(payload) + f":f{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_sha256": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(batches, FRAMES_SCHEMA)
