"""hist_equalize_checksums: per-channel CDF remap vs a direct reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.functions.codec import encode_image
from python_prtree_spark.operators.multimodal import hist_equalize_checksums


def _equalize_ref(px):
    """Dict-based reference (independent of the bincount/LUT kernel)."""
    h, w, _ = px.shape
    n = h * w
    out = np.empty((h, w, 3), dtype=np.int64)
    for ch in range(3):
        counts = {}
        for v in px[:, :, ch].reshape(-1).tolist():
            counts[v] = counts.get(v, 0) + 1
        cdf, acc = {}, 0
        for v in sorted(counts):
            acc += counts[v]
            cdf[v] = acc
        cmin = cdf[min(counts)]
        for r in range(h):
            for c in range(w):
                v = int(px[r, c, ch])
                out[r, c, ch] = (v if n == cmin
                                 else (cdf[v] - cmin) * 255 // (n - cmin))
    return out


def _checksums(out):
    v = out.reshape(-1)
    i1 = np.arange(1, v.size + 1, dtype=np.int64)
    return int(v.sum()), int((i1 * v).sum()), int((i1 * i1 * v).sum())


@pytest.mark.parametrize("fmt", ["raw", "png", "lossy"])
def test_hist_equalize_matches_reference(spark, fmt):
    rng = np.random.default_rng(13)
    imgs, exp = [], {}
    for iid, (h, w) in enumerate([(12, 16), (9, 7), (24, 32)]):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if fmt == "lossy":
            px = px - px % 2
        imgs.append((iid, encode_image(px, fmt)))
        exp[iid] = (w, h) + _checksums(_equalize_ref(px.astype(np.int64)))
    df = spark.createDataFrame(
        pd.DataFrame(imgs, columns=["image_id", "bytes"]),
        "image_id long, bytes binary",
    )
    got = {
        r["image_id"]: (r["w"], r["h"], r["s0"], r["s1"], r["s2"])
        for r in hist_equalize_checksums(df).collect()
    }
    assert got == exp


def test_hist_equalize_constant_channel_identity(spark):
    # channel 0 constant (identity passthrough), channel 1 two-valued
    # (remaps to the {0, 255} extremes), channel 2 full ramp
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 77
    px[:, :4, 1] = 10
    px[:, 4:, 1] = 20
    px[:, :, 2] = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    df = spark.createDataFrame(
        pd.DataFrame([(1, encode_image(px, "raw"))],
                     columns=["image_id", "bytes"]),
        "image_id long, bytes binary",
    )
    r = hist_equalize_checksums(df).collect()[0]
    exp = _equalize_ref(px.astype(np.int64))
    # constant channel untouched; two-valued channel hits the extremes
    assert set(exp[:, :, 0].reshape(-1)) == {77}
    assert set(exp[:, :, 1].reshape(-1)) == {0, 255}
    assert (r["s0"], r["s1"], r["s2"]) == _checksums(exp)
