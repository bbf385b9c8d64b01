"""otsu_threshold vs a brute-force float witness and known splits."""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import otsu_threshold

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


def _brute(cells):
    hist = {}
    for v in cells.values():
        hist[v] = hist.get(v, 0) + 1
    vs = sorted(hist)
    n = sum(hist.values())
    s = sum(v * c for v, c in hist.items())
    best = None
    n0 = s0 = 0
    for v in vs[:-1]:
        n0 += hist[v]
        s0 += v * hist[v]
        score = Fraction((s0 * n - s * n0) ** 2, n0 * (n - n0))
        if best is None or score > best[0]:
            best = (score, v, n0, s0)
    return best[1], best[2], n - best[2], best[3], s - best[3]


def _run(spark, cells):
    row = otsu_threshold(_pix_df(spark, cells), CFG, px=PX).collect()[0]
    return (row["threshold"], row["n_below"], row["n_above"],
            row["s_below"], row["s_above"])


def test_bimodal_clean_split(spark):
    # two tight modes at 10 and 50: the threshold must land in [10, 49]
    # and split the classes exactly at the mode boundary.
    cells = {(x, y): 10 + (x % 3) for x in range(8) for y in range(16)}
    cells.update({(x, y): 50 + (y % 2) for x in range(8, 16)
                  for y in range(16)})
    got = _run(spark, cells)
    assert got == _brute(cells)
    t, n0, n1, _, _ = got
    assert 12 <= t < 50 and n0 == 128 and n1 == 128


def test_vs_brute_mixed(spark):
    cells = {(x, y): (x * x * 5 + y * 3) % 31
             for x in range(16) for y in range(16)
             if (x + y) % 5 != 0}
    assert _run(spark, cells) == _brute(cells)


def test_tie_breaks_to_smallest(spark):
    # symmetric histogram {1: 4, 2: 4}: only candidate t=1. Add {3: 4}:
    # candidates t=1 and t=2 are symmetric -> equal score -> pick t=1.
    cells = {(i, 0): 1 for i in range(4)}
    cells.update({(i, 1): 2 for i in range(4)})
    cells.update({(i, 2): 3 for i in range(4)})
    got = _run(spark, cells)
    assert got == _brute(cells)
    assert got[0] == 1


def test_single_value_raises(spark):
    cells = {(x, 0): 7 for x in range(5)}
    with pytest.raises(ValueError, match="distinct"):
        otsu_threshold(_pix_df(spark, cells), CFG, px=PX)
