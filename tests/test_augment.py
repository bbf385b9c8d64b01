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
