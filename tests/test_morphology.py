"""morphology (grayscale erode/dilate) vs a brute-force witness."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import morphology, structuring_element

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16


def _pix_df(spark, cells, value_col="cnt"):
    side = 1 << CFG.level
    rows = [
        ((gx // PX) * side + (gy // PX), int(gy % PX), int(gx % PX), int(v))
        for (gx, gy), v in cells.items()
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", value_col]),
        f"tile long, r int, c int, {value_col} long",
    )


def _collect(out):
    side = 1 << CFG.level
    got = {}
    for row in out.collect():
        gx = (row["tile"] // side) * PX + row["c"]
        gy = (row["tile"] % side) * PX + row["r"]
        got[(gx, gy)] = row["v"]
    return got


def _brute(cells, op, se):
    out = {}
    for gx in range(16):
        for gy in range(16):
            if op == "dilate":
                vs = [cells[(gx - dx, gy - dy)] for dx, dy in se
                      if (gx - dx, gy - dy) in cells]
                if vs:
                    out[(gx, gy)] = max(vs)
            else:  # erode: full support required, off-grid = hole
                ps = [(gx + dx, gy + dy) for dx, dy in se]
                if all(p in cells for p in ps):
                    out[(gx, gy)] = min(cells[p] for p in ps)
    return out


CASES = [
    ("dilate", structuring_element("square", 1)),
    ("erode", structuring_element("square", 1)),
    ("dilate", structuring_element("diamond", 2)),
    ("erode", structuring_element("diamond", 1)),
    ("dilate", [(2, 0), (0, -1)]),  # asymmetric SE
    ("erode", [(2, 0), (0, -1)]),
]


@pytest.mark.parametrize("op,se", CASES)
def test_vs_brute(spark, op, se):
    # deterministic sparse raster with holes and a value gradient
    cells = {(x, y): 1 + (3 * x + 5 * y) % 11
             for x in range(16) for y in range(16)
             if (x * 7 + y * 13) % 23 != 0}
    got = _collect(morphology(_pix_df(spark, cells), op, se, CFG, px=PX))
    assert got == _brute(cells, op, se)
    assert got  # non-degenerate


def test_single_pixel_dilate_stamps_se(spark):
    cells = {(8, 8): 42}
    se = structuring_element("diamond", 1)
    got = _collect(morphology(_pix_df(spark, cells), "dilate", se, CFG, px=PX))
    assert got == {(8 + dx, 8 + dy): 42 for dx, dy in se}


def test_erode_removes_boundary_layer(spark):
    # solid 5x5 block, 3x3 square SE: erosion keeps the 3x3 interior
    cells = {(x, y): 9 for x in range(5, 10) for y in range(5, 10)}
    got = _collect(morphology(_pix_df(spark, cells), "erode",
                              structuring_element("square", 1), CFG, px=PX))
    assert set(got) == {(x, y) for x in range(6, 9) for y in range(6, 9)}
    assert set(got.values()) == {9}


def test_open_idempotent_on_binary(spark):
    # opening (erode then dilate) of a binary raster is idempotent
    cells = {(x, y): 1 for x in range(3, 12) for y in range(3, 12)}
    cells[(14, 14)] = 1  # isolated speck: opening removes it
    se = structuring_element("square", 1)
    e1 = morphology(_pix_df(spark, cells), "erode", se, CFG, px=PX)
    o1 = _collect(morphology(e1, "dilate", se, CFG, px=PX, value_col="v"))
    assert (14, 14) not in o1
    e2 = morphology(_pix_df(spark, o1), "erode", se, CFG, px=PX)
    o2 = _collect(morphology(e2, "dilate", se, CFG, px=PX, value_col="v"))
    assert o1 == o2


def test_errors(spark):
    df = _pix_df(spark, {(1, 1): 5})
    with pytest.raises(ValueError, match="dilate"):
        morphology(df, "blur", None, CFG, px=PX)
    with pytest.raises(ValueError, match="distinct"):
        morphology(df, "erode", [(0, 0), (0, 0)], CFG, px=PX)
    with pytest.raises(ValueError, match="radius"):
        structuring_element("square", 0)
    with pytest.raises(ValueError, match="shape"):
        structuring_element("hex", 1)
