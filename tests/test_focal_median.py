"""focal_median vs a brute-force 9-slot zero-padded median."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import focal_median

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
    out = {}
    for x in range(16):
        for y in range(16):
            win = sorted(
                cells.get((x + dx, y + dy), 0)
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            )
            med = win[4]
            if med != 0:
                out[(x, y)] = med
    # engine only emits positions with >= 1 lit neighbor; a nonzero
    # median needs >= 5 nonzero slots, so the domains already agree
    return out


def _run(spark, cells):
    side = 1 << CFG.level
    out = focal_median(_pix_df(spark, cells), CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): row["v"]
        for row in out.collect()
    }


def test_vs_brute_dense(spark):
    cells = {(x, y): (x * 5 + y * 3) % 9 + 1
             for x in range(16) for y in range(16)
             if (x + y) % 5 != 0}
    assert _run(spark, cells) == _brute(cells)


def test_speckle_removed(spark):
    # an isolated bright pixel has <= 1 lit slot in every window ->
    # median 0 everywhere -> the speckle disappears entirely
    cells = {(8, 8): 99}
    assert _run(spark, cells) == {}


def test_plateau_survives(spark):
    # a solid 4x4 plateau of 7s: interior windows are all-7 -> median 7
    cells = {(x, y): 7 for x in range(4, 8) for y in range(4, 8)}
    got = _run(spark, cells)
    assert got == _brute(cells)
    assert got[(5, 5)] == 7 and got[(6, 6)] == 7
    # corner window holds only 4 lit slots -> median 0 -> absent
    assert (3, 3) not in got


def test_negative_values(spark):
    # zero padding must sort BETWEEN negative and positive values:
    # window at (5,5) holds {-5,-4,-3,-2,-1,3} + 3 zeros -> median -1
    cells = {(5, 5): -4, (5, 6): -2, (6, 5): -1, (4, 5): -3,
             (5, 4): -5, (6, 6): 3}
    got = _run(spark, cells)
    assert got == _brute(cells)
    assert got[(5, 5)] == -1
