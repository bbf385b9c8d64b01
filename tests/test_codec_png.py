"""Real PNG codec (functions/codec.py encode_png/decode_png) — pure
stdlib-zlib + numpy, spec-compliant (RFC 2083): CRC-checked chunks, all
five scanline filters on decode, color types 0/2/6, multi-IDAT. Verified
against an INDEPENDENT reference filterer implemented here (per-pixel,
straight from the spec's recurrences), not against the engine's own
vectorized paths.

Reference parity context: the reference engine (atksh/python_prtree) has
no image support at all — images come from the BASELINE.json input_hint
(image_id, bytes, w, h, fmt, ...) with the decoded-pixel invariant; PNG
makes the 'fmt' column carry a REAL interchange format end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_prtree_spark.functions.codec import (
    PNG_SIG,
    _png_chunk,
    decode_external,
    decode_image,
    decode_meta,
    decode_png,
    encode_image,
    encode_png,
    phash64,
)

RNG = np.random.Generator(np.random.PCG64(20260817))


def ref_png(px: np.ndarray, ftype: int, ctype: int = 2) -> bytes:
    """Independent PNG writer: filters each row with filter type `ftype`
    using the spec's per-pixel recurrences (no shared code with the
    engine's vectorized encoder/decoder)."""
    h, w, ch = px.shape
    body = bytearray()
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        row = px[y].astype(np.int32)
        filt = np.empty((w, ch), np.int32)
        left = np.zeros(ch, np.int32)
        ul = np.zeros(ch, np.int32)
        for x in range(w):
            a, b, c = left, prev[x], ul
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            filt[x] = (row[x] - pred) & 0xFF
            left = row[x]
            ul = prev[x]
        body.append(ftype)
        body += filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(1, 1), (1, 17), (23, 1), (16, 16), (48, 64), (7, 13)])
def test_roundtrip_exact(shape):
    h, w = shape
    px = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_png(px)
    assert data[:8] == PNG_SIG
    assert np.array_equal(decode_png(data), px)
    # codec-level dispatch: sniffed by magic, meta parsed from IHDR
    assert np.array_equal(decode_image(data), px)
    assert decode_meta(data) == ("png", w, h)
    assert np.array_equal(decode_external(data, "png"), px)
    assert encode_image(px, "png") == data


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_all_five_filters_against_reference(ftype):
    px = RNG.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(ref_png(px, ftype)), px)


def test_gradient_image_all_filters():
    """Smooth gradients are the filters' design case — exercise non-random
    content where Sub/Up/Average/Paeth predictions are usually exact."""
    y, x = np.mgrid[0:20, 0:30]
    px = np.stack([(x * 8) % 256, (y * 8) % 256, (x + y) % 256], axis=2).astype(np.uint8)
    for ftype in range(5):
        assert np.array_equal(decode_png(ref_png(px, ftype)), px)


def test_color_types_gray_and_rgba():
    g = RNG.integers(0, 256, size=(6, 5, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(ref_png(g, 2, ctype=0)), np.repeat(g, 3, axis=2))
    ga = RNG.integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_png(ref_png(ga, 4, ctype=6)), np.ascontiguousarray(ga[:, :, :3])
    )


def test_crc_corruption_detected():
    px = RNG.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    data[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|signature"):
        decode_png(bytes(data))


def test_multi_idat_and_ancillary_chunks():
    px = RNG.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
    data = encode_png(px)
    pos, chunks = 8, []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        chunks.append((data[pos + 4 : pos + 8], data[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    idat = next(p for t, p in chunks if t == b"IDAT")
    rebuilt = (
        PNG_SIG
        + _png_chunk(b"IHDR", next(p for t, p in chunks if t == b"IHDR"))
        + _png_chunk(b"tEXt", b"Comment\x00hello")
        + _png_chunk(b"IDAT", idat[:7])
        + _png_chunk(b"IDAT", idat[7:])
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(rebuilt), px)


def test_unsupported_rejected():
    px = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x00" * 16)
    # 16-bit depth PNG rejected with a clear message
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)
    # jpeg stays an explicit stub
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_external(encode_png(px), "jpeg")


def test_phash_parity_across_formats():
    px = RNG.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert phash64(decode_image(encode_image(px, "raw"))) == phash64(
        decode_image(encode_image(px, "png"))
    )


# ---------------------------------------------------------------------------
# Spark path: PNG rows flow through the whole multimodal pipeline
# ---------------------------------------------------------------------------

def test_image_table_png_rows_end_to_end(spark):
    """datagen now emits fmt='png' every (10k+4)th row: stored bytes are
    real PNG files, the stored phash matches a recompute from decoded
    pixels, and verify_roundtrip reports exact for every png row."""
    from python_prtree_spark.operators.multimodal import (
        recompute_phash,
        verify_roundtrip,
    )
    from python_prtree_spark.sources.datagen import gen_pixels, image_table

    imgs = image_table(spark, 100, partitions=4).cache()
    try:
        png_rows = imgs.where(F.col("fmt") == "png").collect()
        assert len(png_rows) == 10  # ids 4, 14, ..., 94
        for r in png_rows:
            data = bytes(r["bytes"])
            assert data[:8] == PNG_SIG
            assert np.array_equal(
                decode_png(data), gen_pixels(r["id"], r["w"], r["h"])
            )
        vr = verify_roundtrip(imgs).where(F.col("fmt") == "png")
        assert vr.where(~F.col("ok")).count() == 0
        assert vr.count() == 10
        j = recompute_phash(imgs).join(imgs.select("image_id", "phash"), on="image_id")
        assert j.where(F.col("phash") != F.col("phash2")).count() == 0
    finally:
        imgs.unpersist()
