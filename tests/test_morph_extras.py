"""morphology_gradient / top_hat vs brute dilate-erode compositions."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import morphology_gradient, top_hat

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16
SE = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


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


def _dilate(cells):
    out = {}
    for (x, y), v in cells.items():
        for dx, dy in SE:
            p = (x + dx, y + dy)
            if 0 <= p[0] < 16 and 0 <= p[1] < 16:
                out[p] = max(out.get(p, v), v)
    return out


def _erode(cells):
    out = {}
    for x in range(16):
        for y in range(16):
            win = [cells.get((x - dx, y - dy)) for dx, dy in SE
                   if 0 <= x - dx < 16 and 0 <= y - dy < 16]
            if len(win) == len(SE) and all(v is not None for v in win):
                out[(x, y)] = min(win)
    return out


def _sub(a, b):
    out = {}
    for p in set(a) | set(b):
        v = a.get(p, 0) - b.get(p, 0)
        if v != 0:
            out[p] = v
    return out


def _collect(spark_df):
    side = 1 << CFG.level
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): row["v"]
        for row in spark_df.collect()
    }


def test_gradient_vs_brute(spark):
    cells = {(x, y): (x * 3 + y * 5) % 8 + 1
             for x in range(4, 12) for y in range(4, 12)}
    got = _collect(morphology_gradient(_pix_df(spark, cells), None, CFG, px=PX))
    assert got == _sub(_dilate(cells), _erode(cells))


def test_gradient_flags_boundary_only(spark):
    # constant plateau: gradient is zero strictly inside (erode == dilate),
    # positive on the boundary band where erosion's support fails
    cells = {(x, y): 5 for x in range(3, 10) for y in range(3, 10)}
    got = _collect(morphology_gradient(_pix_df(spark, cells), None, CFG, px=PX))
    assert got == _sub(_dilate(cells), _erode(cells))
    assert (6, 6) not in got          # deep interior cancels
    assert got[(3, 3)] == 5           # plateau corner is boundary


def test_white_tophat_extracts_speckle(spark):
    # plateau of 2s with one bright speck: opening flattens the speck,
    # white top-hat = src - open keeps exactly the speck's excess
    cells = {(x, y): 2 for x in range(2, 12) for y in range(2, 12)}
    cells[(6, 6)] = 9
    got = _collect(top_hat(_pix_df(spark, cells), None, CFG, px=PX, kind="white"))
    ero = _erode(cells)
    opened = _dilate(ero)
    want = _sub(cells, opened)
    assert got == want
    assert got[(6, 6)] == 7


def test_black_tophat_extracts_pit(spark):
    cells = {(x, y): 9 for x in range(2, 12) for y in range(2, 12)}
    cells[(6, 6)] = 1
    got = _collect(top_hat(_pix_df(spark, cells), None, CFG, px=PX, kind="black"))
    dil = _dilate(cells)
    closed = _erode(dil)
    want = _sub(closed, cells)
    assert got == want
    assert got[(6, 6)] == 8


def test_bad_kind_rejected(spark):
    with pytest.raises(ValueError, match="kind"):
        top_hat(_pix_df(spark, {(1, 1): 1}), None, CFG, px=PX, kind="gray")
