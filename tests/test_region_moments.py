"""region_moments vs brute flood-fill + direct moment sums."""

from __future__ import annotations

import pandas as pd

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import region_moments

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
    grid = 16
    todo = set(cells)
    out = {}
    while todo:
        seed = next(iter(todo))
        comp, stack = [], [seed]
        seen = set()
        while stack:
            p = stack.pop()
            if p not in todo or p in seen:
                continue
            seen.add(p)
            todo.discard(p)
            comp.append(p)
            x, y = p
            stack += [(x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)]
        rid = min(x * grid + y for x, y in comp)
        n = len(comp)
        sgx = sum(x for x, _ in comp)
        sgy = sum(y for _, y in comp)
        sxx = sum(x * x for x, _ in comp)
        syy = sum(y * y for _, y in comp)
        sxy = sum(x * y for x, y in comp)
        out[rid] = (n, sgx, sgy,
                    n * sxx - sgx * sgx,
                    n * syy - sgy * sgy,
                    n * sxy - sgx * sgy)
    return out


def _run(spark, cells):
    rows = region_moments(_pix_df(spark, cells), CFG, px=PX).collect()
    return {
        r["region_id"]: (r["n_px"], r["sgx"], r["sgy"],
                         r["mu20n"], r["mu02n"], r["mu11n"])
        for r in rows
    }


def test_vs_brute(spark):
    cells = {(x, y): 1
             for x in range(16) for y in range(16)
             if (x * 3 + y * 7) % 4 != 0}
    assert _run(spark, cells) == _brute(cells)


def test_horizontal_bar_orientation(spark):
    # a 1x6 horizontal bar: all y equal -> mu02n = mu11n = 0, mu20n > 0
    cells = {(x, 5): 1 for x in range(4, 10)}
    got = _run(spark, cells)
    assert got == _brute(cells)
    (_, _, _, mu20n, mu02n, mu11n), = got.values()
    assert mu20n > 0 and mu02n == 0 and mu11n == 0


def test_diagonal_blob_positive_covariance(spark):
    # a 4-connected staircase along the diagonal -> mu11n > 0
    cells = {}
    for i in range(5):
        cells[(i, i)] = 1
        cells[(i + 1, i)] = 1
    got = _run(spark, cells)
    assert got == _brute(cells)
    (_, _, _, _, _, mu11n), = got.values()
    assert mu11n > 0


def test_single_pixel_region(spark):
    got = _run(spark, {(7, 3): 9})
    assert got == {7 * 16 + 3: (1, 7, 3, 0, 0, 0)}
