"""template_match_ssd vs a brute-force window scan."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import template_match_ssd

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


def _brute(cells, t):
    rad = len(t) // 2
    out = {}
    for x in range(16):
        for y in range(16):
            nonempty = False
            ssd = 0
            for i, row in enumerate(t):      # i = window row, 0 = top
                for j, w in enumerate(row):
                    p = (x + j - rad, y + i - rad)
                    v = cells.get(p, 0)
                    if v != 0:  # zero-valued == absent (sparse invariant)
                        nonempty = True
                    ssd += (w - v) ** 2
            if nonempty:
                out[(x, y)] = ssd
    return out


def _run(spark, cells, t):
    side = 1 << CFG.level
    out = template_match_ssd(_pix_df(spark, cells), t, CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): row["ssd"]
        for row in out.collect()
    }


CROSS = [[0, 2, 0], [2, 6, 2], [0, 2, 0]]


def test_vs_brute(spark):
    cells = {(x, y): (x * 2 + y * 3) % 7
             for x in range(16) for y in range(16)
             if (x + y) % 4 != 0}
    got = _run(spark, cells, CROSS)
    want = _brute(cells, CROSS)
    # engine drops windows with no lit pixel; brute marks them absent too
    assert got == want


def test_exact_hit_is_zero(spark):
    # plant the cross at (8, 8) on an otherwise empty raster
    cells = {(8, 7): 2, (7, 8): 2, (8, 8): 6, (9, 8): 2, (8, 9): 2}
    got = _run(spark, cells, CROSS)
    assert got == _brute(cells, CROSS)
    assert got[(8, 8)] == 0
    assert min(got, key=got.get) == (8, 8)


def test_asymmetric_template_orientation(spark):
    t = [[9, 0, 0], [0, 0, 0], [0, 0, 0]]  # top-left tap
    cells = {(3, 3): 9}
    got = _run(spark, cells, t)
    assert got == _brute(cells, t)
    # the window whose TOP-LEFT cell is (3,3) is centered at (4,4)
    assert got[(4, 4)] == 0


def test_zero_valued_cells_are_absent(spark):
    # a window whose only lit cells carry value 0 must produce no row
    cells = {(3, 3): 0, (12, 12): 5}
    got = _run(spark, cells, CROSS)
    assert got == _brute(cells, CROSS)
    assert not any(abs(x - 3) <= 1 and abs(y - 3) <= 1 for x, y in got)


def test_even_template_rejected(spark):
    with pytest.raises(ValueError, match="odd"):
        template_match_ssd(_pix_df(spark, {(1, 1): 1}),
                           [[1, 2], [3, 4]], CFG, px=PX)
