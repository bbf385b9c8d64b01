"""resize_nn_checksums: NN thumbnail witness vs a direct numpy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.functions.codec import encode_image
from python_prtree_spark.operators.multimodal import resize_nn_checksums


def _checksums(px, ow, oh):
    h, w, _ = px.shape
    ys = (np.arange(oh) * h) // oh
    xs = (np.arange(ow) * w) // ow
    v = px[ys[:, None], xs[None, :], :].astype(np.int64).reshape(-1)
    i1 = np.arange(1, v.size + 1, dtype=np.int64)
    return int(v.sum()), int((i1 * v).sum()), int((i1 * i1 * v).sum())


@pytest.mark.parametrize("fmt", ["raw", "png", "lossy"])
def test_resize_nn_checksums_match_numpy(spark, fmt):
    rng = np.random.default_rng(11)
    imgs, exp = [], {}
    for iid, (h, w) in enumerate([(12, 16), (24, 32), (7, 5), (16, 16)]):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if fmt == "lossy":
            px = px - px % 2  # lossy codec is exact on even values
        imgs.append((iid, encode_image(px, fmt)))
        exp[iid] = _checksums(px, 16, 16)
    df = spark.createDataFrame(
        pd.DataFrame(imgs, columns=["image_id", "bytes"]),
        "image_id long, bytes binary",
    )
    got = {
        r["image_id"]: (r["s0"], r["s1"], r["s2"])
        for r in resize_nn_checksums(df, 16, 16).collect()
    }
    assert got == exp


def test_resize_nn_upscale_and_identity(spark):
    """out == in dims is the identity; upscale repeats source pixels."""
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    df = spark.createDataFrame(
        pd.DataFrame([(0, encode_image(px, "raw"))], columns=["image_id", "bytes"]),
        "image_id long, bytes binary",
    )
    got = resize_nn_checksums(df, 2, 2).collect()[0]
    assert (got["s0"], got["s1"], got["s2"]) == _checksums(px, 2, 2)
    up = resize_nn_checksums(df, 4, 4).collect()[0]
    assert (up["s0"], up["s1"], up["s2"]) == _checksums(px, 4, 4)


def test_resize_nn_rejects_bad_size(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(0, b"")], columns=["image_id", "bytes"]),
        "image_id long, bytes binary",
    )
    with pytest.raises(ValueError):
        resize_nn_checksums(df, 0, 16)
