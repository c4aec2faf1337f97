"""Pure-numpy codec round-trips + golden values (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest

from thecrowler_spark.functions import codecs as C


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 4), (16, 9), (7, 13)])
def test_ppm_roundtrip(w, h):
    frames = C.decode_ppm(C.make_ppm(w, h, seed=w * h))
    assert len(frames) == 1
    assert np.array_equal(frames[0], C.pixel_pattern(w, h, w * h))


def test_ppm_multiframe_stream():
    data = C.make_ppm(4, 3, seed=9, frames=3)
    frames = C.decode_ppm(data)
    assert len(frames) == 3
    for i, f in enumerate(frames):
        assert np.array_equal(f, C.pixel_pattern(4, 3, 9 + i))


def test_ppm_comment_header():
    raw = b"P6\n# a comment\n2 2\n255\n" + C.pixel_pattern(2, 2, 0).tobytes()
    assert np.array_equal(C.decode_ppm(raw)[0], C.pixel_pattern(2, 2, 0))


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 3), (5, 2), (6, 4), (7, 5)])
def test_bmp_roundtrip_including_padded_widths(w, h):
    # widths 1,3,5,7 exercise non-zero 4-byte row padding
    assert np.array_equal(C.decode_bmp(C.make_bmp(w, h, seed=7)), C.pixel_pattern(w, h, 7))


def test_bmp_rejects_compressed():
    data = bytearray(C.make_bmp(4, 4, 0))
    data[30] = 1  # BI_RLE8
    with pytest.raises(ValueError):
        C.decode_bmp(bytes(data))


@pytest.mark.parametrize("n,rate", [(1, 8000), (100, 16000), (4410, 44100)])
def test_wav_roundtrip(n, rate):
    rate2, ch, samples = C.decode_wav(C.make_wav(n, rate, seed=3))
    assert (rate2, ch) == (rate, 1)
    assert np.array_equal(samples, C.sample_pattern(n, 3))


def test_wav_tolerates_extra_chunk():
    raw = C.make_wav(10, 8000, 1)
    # splice a LIST chunk between fmt and data
    fmt_end = raw.index(b"data")
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOabc" + b"\x00"  # word-aligned
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    _, _, samples = C.decode_wav(spliced)
    assert np.array_equal(samples, C.sample_pattern(10, 1))


def test_resize_nearest_golden():
    """Hand-computed: 4x4 → 2x2 takes source rows/cols 0 and 2."""
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = C.resize_nearest(img, 2, 2)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[0, 0], img[0, 0])
    assert np.array_equal(out[0, 1], img[0, 2])
    assert np.array_equal(out[1, 0], img[2, 0])
    assert np.array_equal(out[1, 1], img[2, 2])
    # upscale is repetition, never interpolation
    up = C.resize_nearest(img, 8, 8)
    assert np.array_equal(up[0, 0], up[0, 1]) and np.array_equal(up[0, 0], img[0, 0])


def test_decoders_reject_garbage():
    for fn in (C.decode_ppm, C.decode_bmp):
        with pytest.raises(ValueError):
            fn(b"\x89PNG\r\n\x1a\n not really")
    with pytest.raises(ValueError):
        C.decode_wav(b"OggS compressed audio")


@pytest.mark.parametrize("w,h", [(1, 1), (4, 6), (9, 7), (11, 5), (3, 12)])
def test_png_roundtrip_all_filters(w, h):
    """Heights >= 5 cycle through every scanline filter (encode side
    uses y % 5), so a decoder that skips defiltering fails here."""
    img = C.decode_png(C.make_png(w, h, seed=w + h))
    assert np.array_equal(img, C.pixel_pattern(w, h, w + h))


def test_png_header_golden():
    data = C.make_png(5, 3, seed=0)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    import struct
    # first chunk: IHDR, 13 bytes, width 5, height 3, depth 8, RGB
    assert struct.unpack_from(">I", data, 8)[0] == 13
    assert data[12:16] == b"IHDR"
    assert struct.unpack(">IIBBBBB", data[16:29]) == (5, 3, 8, 2, 0, 0, 0)
    assert data[-8:-4] == b"IEND"


def test_png_filter_bytes_actually_cycle():
    """The encoder genuinely emits all five filter types (decoder
    independence: a zero-filter-only encoder would let a filter-blind
    decoder pass the round-trip)."""
    import struct
    import zlib

    data = C.make_png(4, 10, seed=7)
    pos, idat = 8, bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        if data[pos + 4 : pos + 8] == b"IDAT":
            idat += data[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
    raw = zlib.decompress(bytes(idat))
    stride = 4 * 3
    fts = [raw[y * (1 + stride)] for y in range(10)]
    assert set(fts) == {0, 1, 2, 3, 4}


def test_png_rejects_corruption_truncation_and_unsupported():
    import struct
    import zlib

    good = C.make_png(8, 8, seed=1)
    # flipped byte -> CRC failure
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        C.decode_png(bytes(bad))
    # truncated stream
    with pytest.raises(ValueError):
        C.decode_png(good[:30])
    # not a PNG at all
    with pytest.raises(ValueError):
        C.decode_png(b"BM this is a bmp")
    # CRC-valid chunk but malformed DEFLATE payload -> ValueError, not
    # a leaked zlib.error (the documented rejection contract)
    body = b"not deflate at all"
    idat = (struct.pack(">I", len(body)) + b"IDAT" + body
            + struct.pack(">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF))
    sig_ihdr = good[: 8 + 12 + 13]
    iend = good[-12:]
    with pytest.raises(ValueError, match="deflate"):
        C.decode_png(sig_ihdr + idat + iend)
    # unsupported: RGBA color type (rebuild IHDR with valid CRC)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 6, 0, 0, 0)
    chunk = (struct.pack(">I", 13) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    rgba = good[:8] + chunk + good[8 + 12 + 13:]
    with pytest.raises(ValueError, match="unsupported"):
        C.decode_png(rgba)


def test_decode_media_real_end_to_end(spark):
    """Binary fixtures through the Arrow mapInPandas decode: dims and
    content hashes match the raw pattern, and a compressed format under
    real_decode=True raises (the honest guard stays)."""
    import hashlib

    import pyspark.sql.functions as F

    from thecrowler_spark.operators import multimodal as MM

    refs = spark.createDataFrame(
        [(f"https://cdn.example.com/r{v}.{MM.variant_ext(v)}", v)
         for v in range(len(MM.REAL_VARIANTS))],
        "media_ref string, variant int",
    )
    out = {r.media_ref: r for r in
           MM.decode_media(MM.attach_real_payloads(refs), real_decode=True).collect()}
    for v, (fmt, params) in enumerate(MM.REAL_VARIANTS):
        r = out[f"https://cdn.example.com/r{v}.{fmt}"]
        if fmt != "wav":
            w, h = params
            assert (r.width, r.height, r.channels) == (w, h, 3)
            assert r.content_sha256 == hashlib.sha256(
                C.pixel_pattern(w, h, v).tobytes()).hexdigest()
        else:
            n, rate = params
            assert (r.sample_rate, r.n_samples, r.channels) == (rate, n, 1)
            assert r.content_sha256 == hashlib.sha256(
                C.sample_pattern(n, v).tobytes()).hexdigest()

    compressed = refs.withColumn(
        "payload", F.encode(F.lit("not really a jpeg"), "utf-8")
    ).withColumn("media_type", F.lit("image/jpeg"))
    with pytest.raises(Exception, match="NotImplementedError|pillow"):
        MM.decode_media(compressed, real_decode=True).collect()
