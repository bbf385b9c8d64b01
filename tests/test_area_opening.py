"""area_opening vs a brute flood-fill size filter."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import area_opening

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


def _brute(cells, min_px):
    todo = set(cells)
    out = {}
    while todo:
        seed = next(iter(todo))
        comp, stack = set(), [seed]
        while stack:
            p = stack.pop()
            if p not in todo:
                continue
            todo.discard(p)
            comp.add(p)
            x, y = p
            stack += [(x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)]
        if len(comp) >= min_px:
            out.update({p: cells[p] for p in comp})
    return out


def _run(spark, cells, min_px):
    side = 1 << CFG.level
    out = area_opening(_pix_df(spark, cells), min_px, CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): row["cnt"]
        for row in out.collect()
    }


def test_vs_brute(spark):
    cells = {(x, y): (x + y) % 5 + 1
             for x in range(16) for y in range(16)
             if (x * 3 + y * 7) % 4 != 0}
    for t in (1, 3, 8):
        assert _run(spark, cells, t) == _brute(cells, t), t


def test_speckles_removed_blob_kept(spark):
    blob = {(x, y): 2 for x in range(4, 9) for y in range(4, 9)}
    cells = dict(blob)
    cells[(0, 0)] = 9          # isolated speck
    cells[(14, 14)] = 9
    cells[(14, 15)] = 9        # 2-cell speck
    got = _run(spark, cells, 3)
    assert got == blob


def test_diagonal_not_connected(spark):
    # 4-connectivity: a diagonal chain is three 1-cell regions
    cells = {(2, 2): 5, (3, 3): 5, (4, 4): 5}
    assert _run(spark, cells, 2) == {}
    assert _run(spark, cells, 1) == cells


def test_cross_tile_region_counts_once(spark):
    # a region straddling the tile seam at gx=3|4 must count as ONE region
    cells = {(3, 5): 1, (4, 5): 1, (5, 5): 1}
    assert _run(spark, cells, 3) == cells
    assert _run(spark, cells, 4) == {}


def test_bad_min_px(spark):
    with pytest.raises(ValueError, match="min_px"):
        area_opening(_pix_df(spark, {(1, 1): 1}), 0, CFG, px=PX)
