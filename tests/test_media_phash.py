"""Perceptual image near-dup: aHash over real decoded pixels + banded
Hamming join. Fixture contract: the same pixels in three containers
(PPM/BMP/PNG) and small retouches stay within MEDIA_HAMMING; different
images never do. The banded join must equal brute force exactly
(pigeonhole guarantee at radius 3 with 4×16-bit chunks)."""

from __future__ import annotations

import numpy as np

from thecrowler_spark.functions import codecs as C
from thecrowler_spark.operators import multimodal as MM


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_ahash64_hand_golden():
    # 8×8 image, one pixel per aHash cell: gray = r+g+b. Cells 0..63
    # get gray 3*k via value k per channel; threshold = mean of cell
    # means = 3*31.5. Bits set exactly for k >= 32 (strictly above).
    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1).repeat(3, axis=2)
    h = C.ahash64(img)
    expect = 0
    for k in range(64):
        if 3 * k > 3 * 63 / 2:
            expect |= 1 << (63 - k)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert h == expect


def test_ahash64_uneven_dims_exact():
    # dims not divisible by 8 → cells of unequal pixel count; the
    # Fraction math must stay exact (no float drift): hashing twice
    # and hashing a copy must agree, and a uniform image hashes to 0
    # (no cell strictly above the mean).
    img = C.neardup_pattern(13, 11, seed=5)
    assert C.ahash64(img) == C.ahash64(img.copy())
    flat = np.full((11, 13, 3), 77, dtype=np.uint8)
    assert C.ahash64(flat) == 0


def test_fixture_separation_bounds():
    """Within-group ≤ MEDIA_HAMMING with margin; cross-group far above —
    the property that makes radius 3 the RIGHT threshold, not a lucky
    one."""
    hashes = {}
    for g in range(MM.N_NEARDUP_GROUPS):
        for v in range(len(MM.NEARDUP_VARIANTS)):
            hashes[(g, v)] = C.ahash64(MM.neardup_image(g, v))
    within_max, cross_min = 0, 64
    for k1, h1 in hashes.items():
        for k2, h2 in hashes.items():
            if k1 >= k2:
                continue
            d = _ham(h1, h2)
            if k1[0] == k2[0]:
                within_max = max(within_max, d)
            else:
                cross_min = min(cross_min, d)
    assert within_max <= MM.MEDIA_HAMMING
    assert cross_min > 2 * MM.MEDIA_HAMMING  # wide separation, not borderline


def test_container_roundtrip_hash_equality():
    """v0 (PPM) / v1 (BMP) / v2 (PNG) carry IDENTICAL pixels: decoding
    the encoded bytes must reproduce them bit-for-bit, so all three
    aHashes are equal — the mirror-hosted-copy case."""
    for g in (0, 3, 7):
        imgs = [
            C.decode_ppm(MM.neardup_payload(g, 0))[0],
            C.decode_bmp(MM.neardup_payload(g, 1)),
            C.decode_png(MM.neardup_payload(g, 2)),
        ]
        hs = {C.ahash64(i) for i in imgs}
        assert len(hs) == 1


def test_media_phash_spark_matches_local(spark):
    refs = spark.createDataFrame(
        [
            (
                f"https://img.example.com/g{g}v{v}.{MM.neardup_ext(v)}",
                g,
                v,
            )
            for g in range(4)
            for v in range(len(MM.NEARDUP_VARIANTS))
        ],
        "media_ref string, grp int, variant int",
    )
    got = {
        r["media_ref"]: r["phash"]
        for r in MM.media_phash(MM.attach_neardup_payloads(refs)).collect()
    }
    for g in range(4):
        for v in range(len(MM.NEARDUP_VARIANTS)):
            ref = f"https://img.example.com/g{g}v{v}.{MM.neardup_ext(v)}"
            assert got[ref] == C.ahash64(MM.neardup_image(g, v))


def test_banded_join_equals_brute_force(spark):
    rows = [
        (f"https://img.example.com/g{g}v{v}.{MM.neardup_ext(v)}", g, v)
        for g in range(MM.N_NEARDUP_GROUPS)
        for v in range(len(MM.NEARDUP_VARIANTS))
    ]
    refs = spark.createDataFrame(rows, "media_ref string, grp int, variant int")
    sig = MM.media_phash(MM.attach_neardup_payloads(refs))
    got = {
        (r["ref_a"], r["ref_b"], r["hamming"])
        for r in MM.media_near_dups(sig).collect()
    }
    # brute force over the locally computed hashes
    local = {
        f"https://img.example.com/g{g}v{v}.{MM.neardup_ext(v)}": C.ahash64(
            MM.neardup_image(g, v)
        )
        for g in range(MM.N_NEARDUP_GROUPS)
        for v in range(len(MM.NEARDUP_VARIANTS))
    }
    keys = sorted(local)
    want = {
        (a, b, _ham(local[a], local[b]))
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if _ham(local[a], local[b]) <= MM.MEDIA_HAMMING
    }
    assert got == want
    # every same-group pair is found, no cross-group pair is
    assert len(want) == MM.N_NEARDUP_GROUPS * 15  # C(6,2) per group


def test_media_neardup_plan_shape(spark):
    """The pair join must be a chunk-keyed equi-join — no cartesian /
    broadcast nested loop anywhere in the plan."""
    refs = spark.createDataFrame(
        [("https://img.example.com/g0v0.ppm", 0, 0)],
        "media_ref string, grp int, variant int",
    )
    sig = MM.media_phash(MM.attach_neardup_payloads(refs))
    plan = MM.media_near_dups(sig)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
