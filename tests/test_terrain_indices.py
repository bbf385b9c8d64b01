"""terrain_indices (TRI / TPI) vs a brute 8-neighbor fold."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import terrain_indices

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16

D8 = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]


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
    out = {}
    for (x, y), v in cells.items():
        ns = [cells.get((x + dx, y + dy), 0) for dx, dy in D8]
        out[(x, y)] = (sum(abs(nv - v) for nv in ns), 8 * v - sum(ns))
    return out


def _run(spark, cells):
    side = 1 << CFG.level
    out = terrain_indices(_pix_df(spark, cells), CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): (row["tri"], row["tpi8"])
        for row in out.collect()
    }


def test_vs_brute(spark):
    cells = {(x, y): (x * 5 + y * 7) % 23 + 1
             for x in range(16) for y in range(16)
             if (x + 2 * y) % 5 != 0}
    assert _run(spark, cells) == _brute(cells)


def test_isolated_cell(spark):
    # all 8 slots read 0: tri = 8|v|, tpi8 = 8v (a sharp peak)
    cells = {(8, 8): 7}
    assert _run(spark, cells) == {(8, 8): (56, 56)}


def test_flat_plateau_interior(spark):
    cells = {(x, y): 5 for x in range(3, 10) for y in range(3, 10)}
    got = _run(spark, cells)
    assert got == _brute(cells)
    assert got[(6, 6)] == (0, 0)          # interior: flat
    assert got[(3, 3)][0] > 0             # boundary: rugged


def test_negative_values(spark):
    cells = {(5, 5): -3, (6, 5): 4, (5, 6): -1}
    assert _run(spark, cells) == _brute(cells)
