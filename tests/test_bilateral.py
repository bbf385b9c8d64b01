"""bilateral_filter vs a dense numpy oracle on a random sparse mosaic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark.config import EngineConfig, Extent
from python_prtree_spark.operators.raster import bilateral_filter

CFG = EngineConfig(extent=Extent(0, 0, 105, 105), level=2)  # 4x4 tiles
PX = 8
SK = [[1, 2, 1], [2, 4, 2], [1, 2, 1]]
RT = [16, 12, 7, 3, 1]


def _brute(pdf):
    side = 4
    grid = side * PX
    dense = np.zeros((grid, grid), dtype=np.int64)  # [gx, gy]
    lit = np.zeros((grid, grid), dtype=bool)
    for t, r, c, v in pdf.itertuples(index=False):
        gx, gy = (t // side) * PX + c, (t % side) * PX + r
        dense[gx, gy] = v
        lit[gx, gy] = True
    out = {}
    for gx in range(grid):
        for gy in range(grid):
            if not lit[gx, gy]:
                continue
            vp = dense[gx, gy]
            num = den = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    qx, qy = gx - dx, gy - dy  # q emitting to p: p = q + d
                    if not (0 <= qx < grid and 0 <= qy < grid) or not lit[qx, qy]:
                        continue
                    vq = dense[qx, qy]
                    w = SK[1 + dy][1 + dx] * RT[min(abs(vp - vq), len(RT) - 1)]
                    num += w * vq
                    den += w
            tile = (gx // PX) * side + gy // PX
            out[(tile, gy % PX, gx % PX)] = (num, den)
    return out


@pytest.mark.parametrize("seed", [2, 31])
def test_bilateral_matches_dense_oracle(spark, seed):
    rng = np.random.default_rng(seed)
    n = 500
    pdf = pd.DataFrame({
        "tile": rng.integers(0, 16, n),
        "r": rng.integers(0, PX, n),
        "c": rng.integers(0, PX, n),
        "cnt": rng.integers(1, 9, n),
    }).drop_duplicates(["tile", "r", "c"])
    got = bilateral_filter(
        spark.createDataFrame(pdf).repartition(8), CFG, px=PX,
        spatial_kernel=SK, range_table=RT,
    ).toPandas()
    want = _brute(pdf)
    assert {
        (int(t), int(r), int(c)): (int(n_), int(d))
        for t, r, c, n_, d in got.itertuples(index=False)
    } == want


def test_bilateral_flat_region_is_plain_blur(spark):
    """On a constant patch the range weight is wr[0] everywhere, so
    num/den == the constant value exactly (edge-preserving identity)."""
    rows = [(0, r, c, 7) for r in range(PX) for c in range(PX)]
    pdf = pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"])
    got = bilateral_filter(spark.createDataFrame(pdf), CFG, px=PX).toPandas()
    assert (got["num"] == 7 * got["den"]).all()
