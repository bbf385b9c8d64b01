"""variogram vs a brute-force pair scan."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import variogram

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16


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


def _brute(cells, lags):
    out = {}
    for dx, dy in lags:
        n = sse = 0
        for (x, y), v in cells.items():
            q = (x + dx, y + dy)
            if q in cells:
                n += 1
                sse += (v - cells[q]) ** 2
        out[(dx, dy)] = (n, sse)
    return {k: v for k, v in out.items() if v[0] > 0}


CELLS = {(x, y): (x * x + 7 * y) % 23
         for x in range(16) for y in range(16)
         if (x + 5 * y) % 8 != 0}


@pytest.mark.parametrize("lags", [
    None,
    [(2, 0), (0, 3), (-1, 2), (4, 4)],
])
def test_vs_brute(spark, lags):
    out = variogram(_pix_df(spark, CELLS), lags, CFG, px=PX)
    got = {(r["dx"], r["dy"]): (r["n"], r["sse"]) for r in out.collect()}
    want = _brute(CELLS, lags or [(1, 0), (0, 1), (1, 1), (1, -1)])
    assert got == want
    assert got


def test_constant_field_zero_variance(spark):
    cells = {(x, y): 9 for x in range(8) for y in range(8)}
    out = variogram(_pix_df(spark, cells), None, CFG, px=PX)
    for r in out.collect():
        assert r["sse"] == 0 and r["n"] > 0


def test_linear_ramp_exact_gamma(spark):
    # z = 3x: increments along (1,0) are exactly 3 -> sse = 9n; along
    # (0,1) exactly 0.
    cells = {(x, y): 3 * x for x in range(10) for y in range(10)}
    out = variogram(_pix_df(spark, cells), [(1, 0), (0, 1)], CFG, px=PX)
    got = {(r["dx"], r["dy"]): (r["n"], r["sse"]) for r in out.collect()}
    assert got[(1, 0)] == (90, 810)
    assert got[(0, 1)] == (90, 0)


def test_bad_lags(spark):
    df = _pix_df(spark, CELLS)
    with pytest.raises(ValueError, match="lags"):
        variogram(df, [(0, 0)], CFG, px=PX)
    with pytest.raises(ValueError, match="lags"):
        variogram(df, [(1, 0), (1, 0)], CFG, px=PX)
    with pytest.raises(ValueError, match="lags"):
        variogram(df, [], CFG, px=PX)
