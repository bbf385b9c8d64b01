"""fast_corners vs a brute FAST-N ring scan."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import _FAST_RING, fast_corners

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 8  # grid = 32


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


def _has_run(mask, n):
    m2 = (mask << 16) | mask
    r = m2
    for k in range(1, n):
        r &= m2 >> k
    return (r & 0xFFFF) != 0


def _brute(cells, t, n_run):
    out = {}
    for (x, y), v in cells.items():
        bright = dark = 0
        for i, (dx, dy) in enumerate(_FAST_RING):
            nv = cells.get((x + dx, y + dy), 0)
            if nv > v + t:
                bright |= 1 << i
            if nv < v - t:
                dark |= 1 << i
        b, d = _has_run(bright, n_run), _has_run(dark, n_run)
        if b or d:
            out[(x, y)] = (int(b), int(d))
    return out


def _run(spark, cells, t=0, n_run=12):
    side = 1 << CFG.level
    out = fast_corners(_pix_df(spark, cells), t, n_run, CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): (row["bright"], row["dark"])
        for row in out.collect()
    }


def test_vs_brute(spark):
    cells = {(x, y): (x * 5 + y * 11) % 17 + 1
             for x in range(24) for y in range(24)
             if (x + 3 * y) % 5 != 0}
    assert _run(spark, cells, t=3) == _brute(cells, 3, 12)


def test_blob_corner_fires_edge_does_not(spark):
    # a solid 10x10 plateau: ring cells outside are 0 ("dark"). An exact
    # 90-degree corner sees an 11-long dark arc — which is exactly why
    # FAST-9 is the canonical variant (FAST-12 misses right angles).
    cells = {(x, y): 9 for x in range(8, 18) for y in range(8, 18)}
    got = _run(spark, cells, t=0, n_run=9)
    assert got == _brute(cells, 0, 9)
    assert got[(8, 8)] == (0, 1)          # corner: 11-long dark arc >= 9
    assert (13, 8) not in got             # edge midpoint: 7-long arc < 9
    assert (13, 13) not in got            # deep interior: ring all equal


def test_isolated_bright_pixel(spark):
    # whole ring absent -> 16-long dark run
    got = _run(spark, {(16, 16): 5}, t=0, n_run=12)
    assert got == {(16, 16): (0, 1)}


def test_threshold_suppresses(spark):
    # ring values within +-t of the center are neither bright nor dark
    cells = {(x, y): 10 for x in range(8, 18) for y in range(8, 18)}
    cells[(13, 13)] = 12                  # small bump, interior
    got = _run(spark, cells, t=3, n_run=12)
    assert got == _brute(cells, 3, 12)
    assert (13, 13) not in got


def test_bad_n_run(spark):
    with pytest.raises(ValueError, match="n_run"):
        fast_corners(_pix_df(spark, {(1, 1): 1}), 0, 17, CFG, px=PX)
