"""harris_corners vs a brute-force structure-tensor witness."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import harris_corners

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16

SOBEL_X = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
SOBEL_Y = [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]


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


def _conv(cells, k):
    out = {}
    for (x, y), v in cells.items():
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                w = k[1 - dy][1 - dx]
                if w == 0:
                    continue
                p = (x + dx, y + dy)
                if 0 <= p[0] < 16 and 0 <= p[1] < 16:
                    out[p] = out.get(p, 0) + v * w
    return {p: v for p, v in out.items() if v != 0}


def _brute(cells, threshold=0):
    gx, gy = _conv(cells, SOBEL_X), _conv(cells, SOBEL_Y)
    prods = {}
    for p in set(gx) | set(gy):
        vx, vy = gx.get(p, 0), gy.get(p, 0)
        prods[p] = (vx * vx, vy * vy, vx * vy)
    sums = {}
    for (x, y), (xx, yy, xy) in prods.items():
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                q = (x + dx, y + dy)
                if 0 <= q[0] < 16 and 0 <= q[1] < 16:
                    a, b, c = sums.get(q, (0, 0, 0))
                    sums[q] = (a + xx, b + yy, c + xy)
    resp = {p: 16 * (a * b - c * c) - (a + b) * (a + b)
            for p, (a, b, c) in sums.items()}
    out = {}
    for (x, y), r in resp.items():
        nbrs = [resp[(x + dx, y + dy)]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                if (x + dx, y + dy) in resp]
        out[(x, y)] = (r, r >= max(nbrs) and r > threshold)
    return out


def _collect(out):
    side = 1 << CFG.level
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): (row["r16"], row["corner"])
        for row in out.collect()
    }


def test_vs_brute(spark):
    cells = {(x, y): 1 + (x * x * 3 + y * y + x * y) % 17
             for x in range(16) for y in range(16)
             if (x * 5 + y * 8) % 13 != 0}
    got = _collect(harris_corners(_pix_df(spark, cells), CFG, px=PX))
    assert got == _brute(cells)
    assert any(c for _, c in got.values())


def test_square_corner_beats_edge(spark):
    # bright 6x6 square on dark: the strongest responses sit at the
    # square's corners, and straight-edge midpoints are not corners.
    cells = {(x, y): 1 for x in range(16) for y in range(16)}
    for x in range(5, 11):
        for y in range(5, 11):
            cells[(x, y)] = 30
    got = _collect(harris_corners(_pix_df(spark, cells), CFG, px=PX))
    assert got == _brute(cells)
    corners = {p for p, (_, c) in got.items() if c}
    # each of the 4 geometric corners has a flagged cell within 1 px
    for cx, cy in ((5, 5), (10, 5), (5, 10), (10, 10)):
        assert any(abs(px_ - cx) <= 1 and abs(py_ - cy) <= 1
                   for px_, py_ in corners), (cx, cy)
    # edge midpoints (straight edges) must not be corners
    for p in ((7, 5), (8, 5), (5, 7), (10, 8)):
        assert p not in corners or not got[p][1]


def test_threshold_filters(spark):
    cells = {(x, y): 1 + (x * x * 3 + y * y + x * y) % 17
             for x in range(16) for y in range(16)}
    hi = 10 ** 9
    got = _collect(harris_corners(_pix_df(spark, cells), CFG, px=PX,
                                  threshold=hi))
    assert got == _brute(cells, threshold=hi)
    flagged = [p for p, (_, c) in got.items() if c]
    loose = _collect(harris_corners(_pix_df(spark, cells), CFG, px=PX))
    assert len(flagged) <= sum(1 for _, c in loose.values() if c)
