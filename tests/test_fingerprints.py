"""Fingerprint family vs independent mirrors.

Parity targets: /root/reference/pkg/fingerprints (factory.go dispatch,
tlsh.go byte histogram, jarm.go fuzzy hash, murmurhash.go %x format,
fingerprints_test.go vectors). Every assertion here compares the Spark
Column output against hashlib / a pure-Python transcription — never
against the Spark implementation itself.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from thecrowler_spark.functions import fingerprints as FP


def _tlsh_py(data: bytes) -> str:
    """Pure-Python transcription of tlsh.go:36-52."""
    buckets = [0] * 256
    for b in data:
        buckets[b] += 1
    return hashlib.sha256(bytes(c % 256 for c in buckets)).hexdigest()


def _jarm_py(raw: str) -> str:
    """Pure-Python transcription of jarm.go:33-108."""
    if raw == FP.JARM_EMPTY_RAW:
        return "0" * 62

    def cb(c: str) -> str:
        if c == "":
            return "00"
        try:
            n = FP.JARM_CIPHERS.index(c) + 1
        except ValueError:
            n = len(FP.JARM_CIPHERS) + 1
        return "%02x" % n

    def vb(v: str) -> str:
        if v == "":
            return "0"
        d = ord(v[-1]) - 48
        return "abcdef"[d] if 0 <= d < 6 else "0"

    fuzzy, alpns = "", ""
    for h in raw.split(","):
        p = h.split("|") + [""] * 4
        fuzzy += cb(p[0]) + vb(p[1])
        alpns += p[2] + p[3]
    return fuzzy + hashlib.sha256(alpns.encode()).hexdigest()[:32]


TEXTS = [
    "CROWler fingerprint input",   # fingerprints_test.go digest vector input
    "",
    "abcabc",
    "héllo ✓ world",               # multi-byte UTF-8
    "a" * 300,                     # bucket count > 255 wraps (byte() truncation)
]


def test_digest_classes_match_hashlib(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), "id long, t string")
    rows = df.select(
        "id",
        FP.md5_hex("t").alias("md5"),
        FP.sha256_hex("t").alias("sha"),
        FP.blake2b_hex("t").alias("b2"),
        FP.tlsh_hex("t").alias("tlsh"),
    ).collect()
    for r in rows:
        b = TEXTS[r["id"]].encode("utf-8")
        assert r["md5"] == hashlib.md5(b).hexdigest()
        assert r["sha"] == hashlib.sha256(b).hexdigest()
        assert r["b2"] == hashlib.blake2b(b, digest_size=32).hexdigest()
        assert r["tlsh"] == _tlsh_py(b)


def test_tlsh_incremental_concat_property(spark):
    """tlsh.go test parity: Update('abc');Update('abc') ≡ 'abcabc', and
    the fingerprint is permutation invariant (bag of bytes)."""
    df = spark.createDataFrame(
        [(1, "abcabc"), (2, "abc" + "abc"), (3, "ccbbaa")], "id long, t string"
    )
    got = {r["id"]: r["f"] for r in df.select("id", FP.tlsh_hex("t").alias("f")).collect()}
    assert got[1] == got[2] == got[3]
    assert got[1] == _tlsh_py(b"abcabc")


def test_murmur_reference_vectors_and_jvm_cross_validation(spark):
    # murmurhash.go test vectors: '' -> '0' (unpadded %x), 'hello' -> 248bfa47
    assert format(FP.murmur3_32(b""), "x") == "0"
    assert format(FP.murmur3_32(b"hello"), "x") == "248bfa47"

    # cross-validate the pure-Python murmur3 against Spark's JVM
    # Murmur3_x86_32 (F.hash on a string = murmur3(utf8 bytes, seed 42),
    # signed int32). Spark's tail handling is nonstandard (each
    # remaining byte is fully mixed individually), so the two agree
    # exactly on inputs whose UTF-8 length is a multiple of 4 — the
    # standard tail is pinned by the 'hello' reference vector above.
    samples = ["", "abcd", "hell", "héllo ✓ w", "x" * 36, "The quick brown fox!"]
    df = spark.createDataFrame(list(enumerate(samples)), "id long, t string")
    rows = df.select("id", F.hash("t").alias("h")).collect()
    for r in rows:
        py = FP.murmur3_32(samples[r["id"]].encode("utf-8"), seed=42)
        signed = py - (1 << 32) if py >= 1 << 31 else py
        assert r["h"] == signed, samples[r["id"]]

    # and the Column output formats like Go's %x
    out = {
        r["id"]: r["m"]
        for r in df.select("id", FP.murmur3_hex("t").alias("m")).collect()
    }
    for i, s in enumerate(samples):
        assert out[i] == format(FP.murmur3_32(s.encode("utf-8")), "x")


def test_jarm_all_branches(spark):
    raws = [
        FP.JARM_EMPTY_RAW,                                    # 62-zero short-circuit
        "0004|771|h2|ext1," + ",".join(["c02b|770|alpn|e"] * 9),  # found ciphers
        "beef|12|x|y,0005||a|",                               # not-found -> 46; empty ver
        "|9|| ,1305|5|z|w",                                   # empty cipher; d=9 -> '0'; d=5 -> 'f'
        "1301|771",                                           # short handshake (pad to 4)
    ]
    df = spark.createDataFrame(list(enumerate(raws)), "id long, raw string")
    got = {r["id"]: r["j"] for r in df.select("id", FP.jarm_hash("raw").alias("j")).collect()}
    for i, raw in enumerate(raws):
        assert got[i] == _jarm_py(raw), raw
    assert got[0] == "0" * 62
    assert len(got[1]) == 62


def test_factory_dispatch(spark):
    df = spark.createDataFrame([(1, "x")], "id long, t string")
    md5_val = df.select(FP.compute_fingerprint("JA3", "t").alias("v")).first()["v"]
    assert md5_val == hashlib.md5(b"x").hexdigest()
    sha_val = df.select(FP.compute_fingerprint("CustomTLS", "t").alias("v")).first()["v"]
    assert sha_val == hashlib.sha256(b"x").hexdigest()

    with pytest.raises(ValueError, match="dedup"):
        FP.compute_fingerprint("simhash", "t")
    with pytest.raises(ValueError, match="cityhash"):
        FP.compute_fingerprint("CityHash", "t")
    with pytest.raises(ValueError, match="unknown"):
        FP.compute_fingerprint("nope", "t")
