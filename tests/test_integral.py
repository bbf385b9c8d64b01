"""tile_integral vs numpy cumsum, plus the O(1) box-sum identity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import tile_integral

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 8


def _pix_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )


def _brute(rows):
    tiles = {}
    for tile, r, c, v in rows:
        tiles.setdefault(tile, np.zeros((PX, PX), dtype=np.int64))[r, c] = v
    out = {}
    for tile, img in tiles.items():
        sat = img.cumsum(axis=0).cumsum(axis=1)
        for r in range(PX):
            for c in range(PX):
                if sat[r, c] != 0:
                    out[(tile, r, c)] = int(sat[r, c])
    return out


def _run(spark, rows):
    out = tile_integral(_pix_df(spark, rows), CFG, px=PX)
    return {(row["tile"], row["r"], row["c"]): row["v"] for row in out.collect()}


def test_vs_numpy_cumsum(spark):
    rows = [
        (t, r, c, (t * 31 + r * 7 + c * 13) % 11 - 2)
        for t in (0, 3, 17)
        for r in range(PX) for c in range(PX)
        if (r * PX + c + t) % 3 != 0
    ]
    rows = [x for x in rows if x[3] != 0]
    assert _run(spark, rows) == _brute(rows)


def test_single_pixel_fills_quadrant(spark):
    # one lit pixel at (r0, c0): I = v exactly on the r>=r0, c>=c0 block
    rows = [(5, 2, 3, 4)]
    got = _run(spark, rows)
    want = {(5, r, c): 4 for r in range(2, PX) for c in range(3, PX)}
    assert got == want


def test_box_sum_identity(spark):
    # the identity integral images exist for:
    # sum(r1..r2, c1..c2) = I[r2,c2] - I[r1-1,c2] - I[r2,c1-1] + I[r1-1,c1-1]
    rng = [(0, r, c, (r * 5 + c * 3) % 7 + 1) for r in range(PX) for c in range(PX)
           if (r + c) % 2 == 0]
    got = _run(spark, rng)

    def i_at(r, c):
        if r < 0 or c < 0:
            return 0
        return got.get((0, r, c), 0)

    vals = {(r, c): v for _, r, c, v in rng}
    for (r1, c1, r2, c2) in [(2, 2, 5, 6), (0, 0, 3, 3), (4, 1, 7, 7)]:
        direct = sum(
            vals.get((r, c), 0)
            for r in range(r1, r2 + 1) for c in range(c1, c2 + 1)
        )
        box = (i_at(r2, c2) - i_at(r1 - 1, c2)
               - i_at(r2, c1 - 1) + i_at(r1 - 1, c1 - 1))
        assert box == direct


def test_tiles_are_independent(spark):
    # a lit cell in tile 1 must not leak into tile 2's table
    rows = [(1, 0, 0, 9), (2, 7, 7, 1)]
    got = _run(spark, rows)
    assert got[(2, 7, 7)] == 1
    assert all(t != 2 or v == 1 for (t, _, _), v in got.items())
