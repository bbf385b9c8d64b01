"""ssim_stats vs a direct reference + metric properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.operators.ssim import ssim_stats

C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2


def _pix_df(spark, arrs):
    rows = []
    for img, a in arrs.items():
        for (py, px), v in np.ndenumerate(a):
            rows.append({"img": img, "px": int(px), "py": int(py), "v": int(v)})
    return spark.createDataFrame(pd.DataFrame(rows))


def _ref_ssim(x, y):
    x = x.astype(float).ravel()
    y = y.astype(float).ravel()
    mx, my = x.mean(), y.mean()
    vx, vy = x.var(), y.var()
    cxy = ((x - mx) * (y - my)).mean()
    return ((2 * mx * my + C1) * (2 * cxy + C2)) / (
        (mx**2 + my**2 + C1) * (vx + vy + C2)
    )


def test_ssim_matches_reference_and_bounds(spark):
    rng = np.random.default_rng(2)
    a = {i: rng.integers(0, 256, (12, 12)) for i in range(6)}
    b = {
        0: a[0].copy(),                                   # identical -> 1
        1: 255 - a[1],                                    # inverted -> low
        2: np.clip(a[2] + rng.integers(-5, 6, (12, 12)), 0, 255),
        3: rng.integers(0, 256, (12, 12)),                # unrelated
        4: np.clip(a[4] + 40, 0, 255),                    # brightness shift
        5: a[5] // 2,                                     # contrast halved
    }
    got = ssim_stats(_pix_df(spark, a), _pix_df(spark, b)).toPandas()
    got = got.set_index("img")
    for i in range(6):
        assert got.loc[i, "ssim"] == pytest.approx(_ref_ssim(a[i], b[i]), rel=1e-12)
        # exact moments
        assert int(got.loc[i, "sx"]) == int(a[i].sum())
        assert int(got.loc[i, "sxy"]) == int((a[i].astype(np.int64) * b[i]).sum())
    assert got.loc[0, "ssim"] == pytest.approx(1.0, abs=1e-12)
    assert got.loc[0, "ssim"] > got.loc[2, "ssim"] > got.loc[1, "ssim"]
    assert (got["ssim"] <= 1.0 + 1e-12).all()


def test_ssim_common_pixels_only(spark):
    """Score runs over the inner pixel join; disjoint images emit nothing."""
    a = {0: np.full((4, 4), 100), 7: np.full((4, 4), 10)}
    b_rows = pd.DataFrame({
        "img": [0] * 8, "px": [0, 1, 2, 3] * 2,
        "py": [0] * 4 + [1] * 4, "v": [100] * 8,
    })
    got = ssim_stats(
        _pix_df(spark, a), spark.createDataFrame(b_rows)
    ).toPandas()
    assert set(got["img"]) == {0}
    assert int(got["n"].iloc[0]) == 8
    assert got["ssim"].iloc[0] == pytest.approx(1.0, abs=1e-12)
