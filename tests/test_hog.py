"""hog_blocks vs a brute-force Sobel + octant + pooling witness."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import hog_blocks

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16

SOBEL_X = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
SOBEL_Y = [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]


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


def _octant(vx, vy):
    if vx > 0 and vy >= 0 and vy < vx:
        return 0
    if vx > 0 and vy >= vx:
        return 1
    if vx <= 0 and vy > 0 and -vx < vy:
        return 2
    if vx < 0 and vy > 0 and -vx >= vy:
        return 3
    if vx < 0 and vy <= 0 and -vy < -vx:
        return 4
    if vx < 0 and vy < 0 and -vy >= -vx:
        return 5
    if vx >= 0 and vy < 0 and vx < -vy:
        return 6
    return 7


def _conv(cells, k):
    out = {}
    for (x, y), v in cells.items():
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                # input at (x, y) feeds output (x+dx, y+dy) with the
                # kernel taken relative to the OUTPUT: k[1-dy][1-dx]
                w = k[1 - dy][1 - dx]
                if w == 0:
                    continue
                p = (x + dx, y + dy)
                if 0 <= p[0] < 16 and 0 <= p[1] < 16:
                    out[p] = out.get(p, 0) + v * w
    return {p: v for p, v in out.items() if v != 0}


def _brute(cells, block):
    gx, gy = _conv(cells, SOBEL_X), _conv(cells, SOBEL_Y)
    acc = {}
    for p in set(gx) | set(gy):
        vx, vy = gx.get(p, 0), gy.get(p, 0)
        key = (p[0] // block, p[1] // block, _octant(vx, vy))
        n, e = acc.get(key, (0, 0))
        acc[key] = (n + 1, e + vx * vx + vy * vy)
    return acc


CELLS = {(x, y): 1 + (x * x + 3 * y) % 13
         for x in range(16) for y in range(16)
         if (x * 9 + y * 2) % 11 != 0}


@pytest.mark.parametrize("block", [4, 8, 16])
def test_vs_brute(spark, block):
    out = hog_blocks(_pix_df(spark, CELLS), CFG, px=PX, block=block)
    got = {(r["bx"], r["by"], r["d8"]): (r["n"], r["energy"])
           for r in out.collect()}
    assert got == _brute(CELLS, block)
    assert got


def test_vertical_edge_dominates_horizontal_gradient(spark):
    # left half dark, right half bright: energy concentrates in the
    # horizontal-gradient sectors (d8 0/7 around +x).
    cells = {(x, y): 1 if x < 8 else 20 for x in range(16) for y in range(16)}
    out = hog_blocks(_pix_df(spark, cells), CFG, px=PX, block=16).collect()
    by_sector = {r["d8"]: r["energy"] for r in out}
    assert max(by_sector, key=by_sector.get) in (0, 7)


def test_block_must_be_positive(spark):
    with pytest.raises(ValueError, match="block"):
        hog_blocks(_pix_df(spark, CELLS), CFG, px=PX, block=0)
