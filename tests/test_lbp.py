"""local_binary_pattern vs a brute-force per-cell bit fold."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import local_binary_pattern

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16

# d_0..d_7 = E, SE, S, SW, W, NW, N, NE in (dx, dy), dy southward (= r)
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
        code = 0
        for i, (dx, dy) in enumerate(D8):
            nv = cells.get((x + dx, y + dy), 0)  # absent/off-grid = 0
            if nv >= v:
                code |= 1 << i
        out[(x, y)] = code
    return out


def _run(spark, cells):
    side = 1 << CFG.level
    out = local_binary_pattern(_pix_df(spark, cells), CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): row["code"]
        for row in out.collect()
    }


def test_vs_brute(spark):
    cells = {(x, y): (x * 7 + y * 11) % 13 + 1
             for x in range(16) for y in range(16)
             if (x * 3 + y) % 4 != 0}
    assert _run(spark, cells) == _brute(cells)


def test_local_max_is_zero(spark):
    # a strict local max gets code 0 and the row is KEPT (domain = lit)
    cells = {(8, 8): 50, (7, 8): 1, (9, 8): 2, (8, 7): 3, (8, 9): 4}
    got = _run(spark, cells)
    assert got == _brute(cells)
    assert got[(8, 8)] == 0


def test_ties_count_as_ge(spark):
    # equal neighbor -> bit SET (>= semantics); E neighbor is bit 0
    cells = {(5, 5): 9, (6, 5): 9}
    got = _run(spark, cells)
    assert got == _brute(cells)
    assert got[(5, 5)] & 1 == 1      # E tie sets bit 0
    assert got[(6, 5)] & (1 << 4) == 1 << 4  # W tie sets bit 4


def test_nonpositive_center_absent_neighbors(spark):
    # center <= 0: every absent/off-grid neighbor reads 0 >= v -> bit set
    cells = {(0, 0): -5}
    got = _run(spark, cells)
    assert got == _brute(cells)
    assert got[(0, 0)] == 255


def test_isolated_positive_cell(spark):
    cells = {(3, 3): 4}
    assert _run(spark, cells) == {(3, 3): 0}
