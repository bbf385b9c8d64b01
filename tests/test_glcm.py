"""glcm (co-occurrence counts) vs a brute-force witness."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import glcm

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


def _brute(cells, offset, symmetric):
    dx, dy = offset
    acc = {}
    for (gx, gy), va in cells.items():
        p = (gx + dx, gy + dy)
        if p not in cells:
            continue
        for key in ([(va, cells[p]), (cells[p], va)]
                    if symmetric else [(va, cells[p])]):
            acc[key] = acc.get(key, 0) + 1
    return acc


CELLS = {(x, y): (x * 2 + y * 3) % 5
         for x in range(16) for y in range(16)
         if (x + y * 6) % 7 != 0}


@pytest.mark.parametrize("offset,symmetric", [
    ((1, 0), True), ((0, 1), True), ((1, 1), False), ((-1, 2), True),
])
def test_vs_brute(spark, offset, symmetric):
    out = glcm(_pix_df(spark, CELLS), offset, symmetric, CFG, px=PX)
    got = {(r["va"], r["vb"]): r["n"] for r in out.collect()}
    assert got == _brute(CELLS, offset, symmetric)
    assert got


def test_symmetric_matrix_is_symmetric(spark):
    out = glcm(_pix_df(spark, CELLS), (1, 0), True, CFG, px=PX)
    got = {(r["va"], r["vb"]): r["n"] for r in out.collect()}
    assert got == {(b, a): n for (a, b), n in got.items()}
    # total mass = 2 * number of valid pairs
    total = sum(got.values())
    assert total == 2 * sum(_brute(CELLS, (1, 0), False).values())


def test_uniform_texture_single_bin(spark):
    cells = {(x, y): 7 for x in range(4) for y in range(4)}
    out = glcm(_pix_df(spark, cells), (1, 0), True, CFG, px=PX)
    got = {(r["va"], r["vb"]): r["n"] for r in out.collect()}
    assert got == {(7, 7): 24}  # 12 horizontal pairs, doubled


def test_zero_offset_rejected(spark):
    with pytest.raises(ValueError, match="non-zero"):
        glcm(_pix_df(spark, CELLS), (0, 0), True, CFG, px=PX)
