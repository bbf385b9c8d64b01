"""augment_checksums + image_ahash vs direct numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.functions.codec import encode_image
from python_prtree_spark.operators.multimodal import (
    augment_checksums,
    image_ahash,
)


def _aug_oracle(px, cw, ch):
    """hflip -> 90deg CW -> center crop, then the Σv/Σiv/Σi²v witness."""
    aug = np.rot90(px[:, ::-1, :], k=-1)
    oy = (aug.shape[0] - ch) // 2
    ox = (aug.shape[1] - cw) // 2
    v = aug[oy:oy + ch, ox:ox + cw, :].astype(np.int64).reshape(-1)
    i1 = np.arange(1, v.size + 1, dtype=np.int64)
    return int(v.sum()), int((i1 * v).sum()), int((i1 * i1 * v).sum())


def _ahash_oracle(px):
    px = px.astype(np.int64)
    h, w, _ = px.shape
    g = (px[..., 0] * 299 + px[..., 1] * 587 + px[..., 2] * 114) // 1000
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    s = g[ys[:, None], xs[None, :]]
    m = int(s.sum()) // 64
    bits = (s > m).reshape(-1).astype(np.int64)
    idx = np.arange(32, dtype=np.int64)
    return int((bits[32:] << idx).sum()), int((bits[:32] << idx).sum())


def _img_df(spark, imgs):
    return spark.createDataFrame(
        pd.DataFrame(imgs, columns=["image_id", "bytes"]),
        "image_id long, bytes binary",
    )


@pytest.mark.parametrize("fmt", ["raw", "png", "lossy"])
def test_augment_checksums_match_numpy(spark, fmt):
    rng = np.random.default_rng(5)
    imgs, exp = [], {}
    for iid, (h, w) in enumerate([(12, 16), (24, 32), (16, 16), (10, 9)]):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if fmt == "lossy":
            px = px - px % 2
        imgs.append((iid, encode_image(px, fmt)))
        exp[iid] = _aug_oracle(px, 8, 8)
    got = {
        r["image_id"]: (r["s0"], r["s1"], r["s2"])
        for r in augment_checksums(_img_df(spark, imgs), 8, 8).collect()
    }
    assert got == exp


def test_augment_source_pixel_remap_formula(spark):
    """The chain equals the closed-form remap sr=H-1-(ocol+ox),
    sc=W-1-(orow+oy) — the identity the SQL oracle relies on."""
    rng = np.random.default_rng(6)
    h, w, cw, ch = 12, 16, 8, 8
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ox, oy = (h - cw) // 2, (w - ch) // 2
    remap = np.zeros((ch, cw, 3), dtype=np.uint8)
    for orow in range(ch):
        for ocol in range(cw):
            remap[orow, ocol, :] = px[h - 1 - (ocol + ox), w - 1 - (orow + oy), :]
    v = remap.astype(np.int64).reshape(-1)
    i1 = np.arange(1, v.size + 1, dtype=np.int64)
    got = augment_checksums(
        _img_df(spark, [(0, encode_image(px, "raw"))]), cw, ch
    ).collect()[0]
    assert (got["s0"], got["s1"], got["s2"]) == (
        int(v.sum()), int((i1 * v).sum()), int((i1 * i1 * v).sum()))


def test_augment_rejects_bad_sizes(spark):
    df = _img_df(spark, [(0, b"")])
    with pytest.raises(ValueError):
        augment_checksums(df, 0, 8)
    # crop larger than the rotated frame raises inside the kernel
    small = _img_df(
        spark, [(0, encode_image(np.zeros((4, 4, 3), np.uint8), "raw"))])
    with pytest.raises(Exception, match="smaller than rotated crop"):
        augment_checksums(small, 8, 8).collect()


def test_image_ahash_matches_numpy_and_dedups(spark):
    rng = np.random.default_rng(8)
    base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    imgs = [
        (0, encode_image(base, "raw")),
        (1, encode_image(base, "png")),  # same content, different encoding
        (2, encode_image(other, "raw")),
    ]
    got = {
        r["image_id"]: (r["hash_hi"], r["hash_lo"])
        for r in image_ahash(_img_df(spark, imgs)).collect()
    }
    assert got[0] == _ahash_oracle(base)
    assert got[2] == _ahash_oracle(other)
    # identical pixels under different codecs collapse to one hash
    assert got[0] == got[1]
    assert got[0] != got[2]
    # both halves stay non-negative (positive 32-bit packing)
    assert all(hi >= 0 and lo >= 0 for hi, lo in got.values())


def test_image_ahash_brightness_invariance(spark):
    """aHash thresholds on the image's own mean, so a global +20
    brightness shift (no clipping) keeps the fingerprint stable —
    the property that makes it a useful near-dup prefilter."""
    rng = np.random.default_rng(9)
    base = rng.integers(0, 200, (16, 16, 3), dtype=np.uint8)
    shifted = (base + 20).astype(np.uint8)
    imgs = [(0, encode_image(base, "raw")), (1, encode_image(shifted, "raw"))]
    got = {
        r["image_id"]: (r["hash_hi"], r["hash_lo"])
        for r in image_ahash(_img_df(spark, imgs)).collect()
    }
    hi0, lo0 = got[0]
    hi1, lo1 = got[1]
    # hamming distance between the two 64-bit hashes stays tiny
    ham = bin((hi0 ^ hi1) & 0xFFFFFFFF).count("1") + bin(
        (lo0 ^ lo1) & 0xFFFFFFFF).count("1")
    assert ham <= 4, ham


def _bilinear_fixed(px, ow, oh):
    """Driver-side twin of resize_bilinear_checksums' kernel."""
    px = px.astype(np.int64)
    h, w, _ = px.shape

    def axis(n_out, n_src):
        s16 = (8 * (2 * np.arange(n_out, dtype=np.int64) + 1) * n_src
               ) // n_out - 8
        s16 = np.maximum(s16, 0)
        return s16 // 16, np.minimum(s16 // 16 + 1, n_src - 1), s16 % 16

    y0, y1, fy = axis(oh, h)
    x0, x1, fx = axis(ow, w)
    fyc, fxc = fy[:, None, None], fx[None, :, None]
    return (
        (16 - fxc) * (16 - fyc) * px[y0[:, None], x0[None, :], :]
        + fxc * (16 - fyc) * px[y0[:, None], x1[None, :], :]
        + (16 - fxc) * fyc * px[y1[:, None], x0[None, :], :]
        + fxc * fyc * px[y1[:, None], x1[None, :], :]
    ) // 256


@pytest.mark.parametrize("fmt", ["raw", "png", "lossy"])
def test_bilinear_checksums_match_numpy(spark, fmt):
    from python_prtree_spark.operators.multimodal import (
        resize_bilinear_checksums,
    )

    rng = np.random.default_rng(13)
    imgs, exp = [], {}
    for iid, (h, w) in enumerate([(12, 16), (24, 32), (16, 16), (9, 7)]):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if fmt == "lossy":
            px = px - px % 2
        imgs.append((iid, encode_image(px, fmt)))
        v = _bilinear_fixed(px, 12, 12).reshape(-1)
        i1 = np.arange(1, v.size + 1, dtype=np.int64)
        exp[iid] = (int(v.sum()), int((i1 * v).sum()), int((i1 * i1 * v).sum()))
    got = {
        r["image_id"]: (r["s0"], r["s1"], r["s2"])
        for r in resize_bilinear_checksums(
            _img_df(spark, imgs), 12, 12).collect()
    }
    assert got == exp


def test_bilinear_identity_at_same_size(spark):
    """out == src dims: s16 = 16·o exactly (zero fraction), so the
    fixed-point kernel reduces to the identity — no smoothing loss."""
    from python_prtree_spark.operators.multimodal import (
        resize_bilinear_checksums,
    )

    rng = np.random.default_rng(14)
    px = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    got = resize_bilinear_checksums(
        _img_df(spark, [(0, encode_image(px, "raw"))]), 12, 10).collect()[0]
    v = px.astype(np.int64).reshape(-1)
    i1 = np.arange(1, v.size + 1, dtype=np.int64)
    assert (got["s0"], got["s1"], got["s2"]) == (
        int(v.sum()), int((i1 * v).sum()), int((i1 * i1 * v).sum()))


def test_bilinear_close_to_float_reference(spark):
    """Q4 fixed point tracks true float bilinear within quantization
    error (< 16 levels per axis => a few units per pixel)."""
    rng = np.random.default_rng(15)
    px = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    fixed = _bilinear_fixed(px, 12, 12).astype(np.float64)
    h, w = 24, 32

    def faxis(n_out, n_src):
        s = (np.arange(n_out) + 0.5) * n_src / n_out - 0.5
        s = np.clip(s, 0, n_src - 1)
        i0 = np.floor(s).astype(int)
        i1 = np.minimum(i0 + 1, n_src - 1)
        return i0, i1, s - i0

    y0, y1, fy = faxis(12, h)
    x0, x1, fx = faxis(12, w)
    fyc, fxc = fy[:, None, None], fx[None, :, None]
    pf = px.astype(np.float64)
    ref = ((1 - fxc) * (1 - fyc) * pf[y0[:, None], x0[None, :], :]
           + fxc * (1 - fyc) * pf[y0[:, None], x1[None, :], :]
           + (1 - fxc) * fyc * pf[y1[:, None], x0[None, :], :]
           + fxc * fyc * pf[y1[:, None], x1[None, :], :])
    assert np.abs(fixed - ref).max() <= 24  # Q4 quantization bound
