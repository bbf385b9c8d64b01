"""canny_edges vs a brute-force NMS + hysteresis witness."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import canny_edges

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16

SOBEL_X = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
SOBEL_Y = [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]
AXIS = {0: (1, 0), 1: (1, 1), 2: (0, 1), 3: (-1, 1)}


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


def _octant(vx, vy):
    if vx > 0 and vy >= 0 and vy < vx:
        return 0
    if vx > 0 and vy >= vx:
        return 1
    if vx <= 0 and vy > 0 and -vx < vy:
        return 2
    if vx < 0 and vy > 0 and -vx >= vy:
        return 3
    if vx < 0 and vy <= 0 and -vy < -vx:
        return 4
    if vx < 0 and vy < 0 and -vy >= -vx:
        return 5
    if vx >= 0 and vy < 0 and vx < -vy:
        return 6
    return 7


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


def _brute(cells, t_low, t_high):
    gx, gy = _conv(cells, SOBEL_X), _conv(cells, SOBEL_Y)
    grad = {}
    for p in set(gx) | set(gy):
        vx, vy = gx.get(p, 0), gy.get(p, 0)
        grad[p] = (vx * vx + vy * vy, _octant(vx, vy) % 4)
    nms = {}
    for (x, y), (s2, dc) in grad.items():
        dx, dy = AXIS[dc]
        n1 = grad.get((x + dx, y + dy), (0,))[0]
        n2 = grad.get((x - dx, y - dy), (0,))[0]
        if s2 >= max(n1, n2) and s2 >= t_low:
            nms[(x, y)] = (s2, s2 >= t_high)
    # hysteresis: BFS from strong pixels through 8-connected survivors
    keep = {p for p, (_, st) in nms.items() if st}
    stack = list(keep)
    while stack:
        x, y = stack.pop()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                q = (x + dx, y + dy)
                if q in nms and q not in keep:
                    keep.add(q)
                    stack.append(q)
    return {p: nms[p] for p in keep}


def _run(spark, cells, t_low, t_high):
    side = 1 << CFG.level
    out = canny_edges(_pix_df(spark, cells), t_low, t_high, CFG, px=PX)
    return {
        ((row["tile"] // side) * PX + row["c"],
         (row["tile"] % side) * PX + row["r"]): (row["slope2"], row["strong"])
        for row in out.collect()
    }


def test_vs_brute(spark):
    cells = {(x, y): (x * x * 7 + y * 5 + (x * y) % 4) % 37
             for x in range(16) for y in range(16)
             if (x * 3 + y * 11) % 17 != 0}
    for t_low, t_high in ((50, 2000), (200, 5000)):
        got = _run(spark, cells, t_low, t_high)
        want = _brute(cells, t_low, t_high)
        assert got == want, (t_low, t_high)
        assert any(st for _, st in got.values())
        assert any(not st for _, st in got.values())  # weak kept via chain


def test_step_edge_localized(spark):
    # vertical step: NMS thins the response to the two columns around
    # the step; all survivors sit at x in {7, 8}.
    cells = {(x, y): 2 if x < 8 else 30 for x in range(16) for y in range(16)}
    got = _run(spark, cells, 100, 1000)
    assert got == _brute(cells, 100, 1000)
    # interior survivors (away from the zero-padded frame boundary,
    # which legitimately responds) hug the step at x in {7, 8}
    interior = {(x, y) for (x, y) in got if 2 <= y <= 13 and 2 <= x <= 13}
    assert interior and all(x in (7, 8) for x, _ in interior)


def test_isolated_weak_dropped(spark):
    # a weak blob far from any strong edge must vanish entirely
    cells = {(x, y): 30 if (6 <= x <= 9 and 6 <= y <= 9) else 2
             for x in range(16) for y in range(16)}
    # thresholds chosen so the blob boundary is weak-only
    t_high = 10 ** 9
    got = _run(spark, cells, 100, t_high)
    assert got == {}
    assert _brute(cells, 100, t_high) == {}


def test_bad_thresholds(spark):
    df = _pix_df(spark, {(1, 1): 5})
    with pytest.raises(ValueError, match="t_low"):
        canny_edges(df, 0, 10, CFG, px=PX)
    with pytest.raises(ValueError, match="t_low"):
        canny_edges(df, 20, 10, CFG, px=PX)
