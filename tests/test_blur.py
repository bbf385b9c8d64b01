"""raster_convolve with N x N kernels (binomial blur) vs brute force."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import raster_convolve

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16

B5 = [1, 4, 6, 4, 1]
GAUSS5 = [[a * b for a in B5] for b in B5]  # sums to 256


def _pix_df(spark, cells):
    side = 1 << CFG.level
    rows = [
        ((gx // PX) * side + (gy // PX), int(gy % PX), int(gx % PX), int(v))
        for (gx, gy), v in cells.items()
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )


def _brute(cells, k):
    rad = len(k) // 2
    out = {}
    for (x, y), v in cells.items():
        for dy in range(-rad, rad + 1):
            for dx in range(-rad, rad + 1):
                w = k[rad - dy][rad - dx]
                if w == 0:
                    continue
                p = (x + dx, y + dy)
                if 0 <= p[0] < 16 and 0 <= p[1] < 16:
                    out[p] = out.get(p, 0) + v * w
    return {p: v for p, v in out.items() if v != 0}


def _run(spark, cells, k):
    side = 1 << CFG.level
    out = raster_convolve(_pix_df(spark, cells), k, CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): row["v"]
        for row in out.collect()
    }


def test_gauss5_vs_brute(spark):
    cells = {(x, y): 1 + (x * 5 + y * y) % 9
             for x in range(16) for y in range(16)
             if (x + y * 3) % 7 != 0}
    assert _run(spark, cells, GAUSS5) == _brute(cells, GAUSS5)


def test_gauss5_mass_preserving_interior(spark):
    # single interior impulse: the blur stamps the full kernel (sum 256)
    cells = {(8, 8): 1}
    got = _run(spark, cells, GAUSS5)
    assert sum(got.values()) == 256
    assert got[(8, 8)] == 36 and got[(6, 6)] == 1 and got[(10, 10)] == 1


def test_asymmetric_5x5(spark):
    k = [[0] * 5 for _ in range(5)]
    k[0][4] = 3   # top-right corner tap
    k[2][2] = 1   # center
    cells = {(5, 5): 7, (9, 9): 2}
    got = _run(spark, cells, k)
    assert got == _brute(cells, k)
    # top-right tap: kernel row 0 = topmost (dy=+2 from source ->
    # out[p] reads in[p - (dx,dy)] with w = k[2-dy][2-dx]
    assert got[(5, 5)] == 7 and got[(3, 7)] == 21


def test_3x3_unchanged(spark):
    sob = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
    cells = {(x, y): (x * 3 + y) % 5 for x in range(8) for y in range(8)}
    assert _run(spark, cells, sob) == _brute(cells, sob)


def test_even_kernel_rejected(spark):
    with pytest.raises(ValueError, match="odd"):
        raster_convolve(_pix_df(spark, {(1, 1): 1}),
                        [[1, 2], [3, 4]], CFG, px=PX)
