"""Ordinary kriging invariants + agreement with a direct dense solve."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.config import EngineConfig, Extent
from python_prtree_spark.operators.interpolate import kriging_grid

CFG = EngineConfig(extent=Extent(0.0, 0.0, 64.0, 64.0), level=2)  # 16-unit tiles
PX = 8  # pixel = 2 units, centers at odd integers


def _grid_df(spark, pts):
    return spark.createDataFrame(pd.DataFrame(pts))


def _gamma(h, ng, sl, a):
    hr = np.minimum(h / a, 1.0)
    g = ng + (sl - ng) * (1.5 * hr - 0.5 * hr**3)
    return np.where(h <= 0.0, 0.0, g)


def _direct(pxy, sx, sy, sv, ng, sl, a, radius):
    dp_all = np.sqrt((pxy[0] - sx) ** 2 + (pxy[1] - sy) ** 2)
    keep = dp_all <= radius
    sx, sy, sv = sx[keep], sy[keep], sv[keep]
    if len(sx) == 1:
        return float(sv[0])
    m = len(sx)
    d = np.sqrt((sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2)
    A = np.zeros((m + 1, m + 1))
    A[:m, :m] = _gamma(d, ng, sl, a)
    A[m, :m] = 1.0
    A[:m, m] = 1.0
    b = np.ones(m + 1)
    dp = np.sqrt((pxy[0] - sx) ** 2 + (pxy[1] - sy) ** 2)
    b[:m] = _gamma(dp, ng, sl, a)
    w = np.linalg.solve(A, b)
    return float(w[:m] @ sv)


def test_constant_field_reproduces_exactly(spark):
    """Weights sum to 1 -> a constant field kriges to the constant."""
    rng = np.random.default_rng(4)
    pts = {
        "x": rng.random(12) * 30 + 2, "y": rng.random(12) * 30 + 2,
        "value": np.full(12, 7.25),
    }
    got = kriging_grid(_grid_df(spark, pts), 20.0, CFG, px=PX,
                       sill=2.0, vrange=15.0).toPandas()
    assert len(got) > 0
    assert np.allclose(got["est"], 7.25, atol=1e-9)


def test_single_sample_and_exact_interpolation(spark):
    """One sample -> its value everywhere in range; a sample AT a pixel
    center is honored exactly (nugget 0)."""
    one = {"x": [9.0], "y": [9.0], "value": [3.5]}  # (9, 9) is a center
    got = kriging_grid(_grid_df(spark, one), 6.0, CFG, px=PX).toPandas()
    assert len(got) > 0 and np.allclose(got["est"], 3.5)
    two = {"x": [9.0, 15.0], "y": [9.0, 9.0], "value": [2.0, 10.0]}
    got2 = kriging_grid(_grid_df(spark, two), 30.0, CFG, px=PX,
                        sill=1.0, vrange=20.0).toPandas()
    at = got2[(got2["tile"] == got2["tile"].min())]
    # pixel center (9, 9): row r=(9-ty0)/2-0.5 etc. — find via est lookup
    # tile 0 spans [0,16)^2; center (9,9) -> c=4, r=4
    hit = got2[(got2["tile"] == 0) & (got2["r"] == 4) & (got2["c"] == 4)]
    assert len(hit) == 1 and hit["est"].iloc[0] == pytest.approx(2.0, abs=1e-9)


def test_matches_direct_solve_and_midpoint_symmetry(spark):
    rng = np.random.default_rng(11)
    m = 9
    sx = rng.random(m) * 28 + 2
    sy = rng.random(m) * 28 + 2
    sv = rng.random(m) * 10
    got = kriging_grid(
        _grid_df(spark, {"x": sx, "y": sy, "value": sv}),
        40.0, CFG, px=PX, nugget=0.1, sill=2.0, vrange=25.0,
    ).toPandas()
    side = 1 << CFG.level
    cw = CFG.extent.width() / side
    for rrow in got.sample(12, random_state=0).itertuples():
        ix, iy = rrow.tile // side, rrow.tile % side
        pxy = (
            CFG.extent.xmin + ix * cw + (rrow.c + 0.5) * (cw / PX),
            CFG.extent.ymin + iy * cw + (rrow.r + 0.5) * (cw / PX),
        )
        assert rrow.est == pytest.approx(
            _direct(pxy, sx, sy, sv, 0.1, 2.0, 25.0, 40.0), abs=1e-8
        )
    # symmetric two-sample midpoint -> arithmetic mean
    mid = kriging_grid(
        _grid_df(spark, {"x": [7.0, 11.0], "y": [9.0, 9.0], "value": [4.0, 8.0]}),
        30.0, CFG, px=PX, sill=1.0, vrange=20.0,
    ).toPandas()
    h = mid[(mid["tile"] == 0) & (mid["r"] == 4) & (mid["c"] == 4)]  # (9, 9)
    assert h["est"].iloc[0] == pytest.approx(6.0, abs=1e-9)


def test_duplicate_samples_collapse(spark):
    """Exact-duplicate coordinates average, not crash."""
    pts = {"x": [9.0, 9.0, 13.0], "y": [9.0, 9.0, 9.0], "value": [2.0, 4.0, 9.0]}
    got = kriging_grid(_grid_df(spark, pts), 20.0, CFG, px=PX).toPandas()
    assert len(got) > 0
    hit = got[(got["tile"] == 0) & (got["r"] == 4) & (got["c"] == 4)]
    assert hit["est"].iloc[0] == pytest.approx(3.0, abs=1e-9)  # avg(2, 4) at site
    assert int(hit["n_used"].iloc[0]) == 2
    assert got["n_used"].between(1, 2).all()
