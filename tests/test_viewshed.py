"""viewshed_los vs a driver-side brute-force horizon scan."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import viewshed_los

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


def _obs(gx, gy):
    side = 1 << CFG.level
    return ((gx // PX) * side + (gy // PX), int(gy % PX), int(gx % PX))


def _brute(cells, o, max_radius=None):
    """Horizon scan per ray in pure python (floats are exact here: the
    slope lattice is 1/d with d <= 16, far inside double precision)."""
    ox, oy = o
    e0 = cells[o]
    out = {}
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                   (1, 1), (1, -1), (-1, 1), (-1, -1)):
        horizon = None
        d = 0
        while True:
            d += 1
            if max_radius is not None and d > max_radius:
                break
            p = (ox + dx * d, oy + dy * d)
            if not (0 <= p[0] < 16 and 0 <= p[1] < 16):
                break
            if p not in cells:
                continue  # unlit cells do not occlude
            sq = math.floor(1_000_000 * (cells[p] - e0) / d)
            out[p] = (d, sq, horizon is None or sq > horizon)
            horizon = sq if horizon is None else max(horizon, sq)
    return out


def _run(spark, cells, o, **kw):
    out = viewshed_los(_pix_df(spark, cells), _obs(*o), CFG, px=PX, **kw)
    side = 1 << CFG.level
    got = {}
    for row in out.collect():
        gx = (row["tile"] // side) * PX + row["c"]
        gy = (row["tile"] % side) * PX + row["r"]
        got[(gx, gy)] = (row["d"], row["slope_q"], row["visible"])
    return got


def test_ridge_shadows(spark):
    # flat plain with one ridge east of the observer: cells behind the
    # ridge on the +x ray are shadowed, the ridge itself is visible.
    cells = {(x, 8): 10 for x in range(16)}
    cells[(11, 8)] = 50  # ridge 3 cells east of observer at x=8
    got = _run(spark, cells, (8, 8))
    assert got == _brute(cells, (8, 8))
    assert got[(11, 8)][2]  # ridge visible
    assert not got[(12, 8)][2] and not got[(15, 8)][2]  # shadowed
    assert got[(9, 8)][2]       # first cell on a ray: no horizon yet
    assert not got[(10, 8)][2]  # flat: slope 0 does not beat horizon 0


def test_flat_plane_only_first_visible(spark):
    # equal elevations: slope_q is 0 at every d; strict > means only the
    # first cell on each ray is visible.
    cells = {(x, y): 7 for x in range(16) for y in range(16)}
    got = _run(spark, cells, (5, 5))
    assert got == _brute(cells, (5, 5))
    for (gx, gy), (d, sq, vis) in got.items():
        assert vis == (d == 1), (gx, gy)


def test_monotone_ramp_all_visible(spark):
    # convex bowl (elev = d^2): slope d^2/d = d strictly rises with
    # distance, so every on-ray cell beats every nearer horizon.
    o = (2, 2)
    cells = {(x, y): max(abs(x - o[0]), abs(y - o[1])) ** 2
             for x in range(16) for y in range(16)}
    got = _run(spark, cells, o)
    assert got == _brute(cells, o)
    assert all(vis for (_, _, vis) in got.values())
    # all 8 rays present, diagonals included
    assert (5, 5) in got and (0, 0) in got


def test_sparse_gaps_do_not_occlude(spark):
    # unlit cells on a ray are skipped: a far cell is judged against the
    # horizon of the lit cells only.
    cells = {(8, 8): 10, (10, 8): 40, (13, 8): 30}
    got = _run(spark, cells, (8, 8))
    assert got == _brute(cells, (8, 8))
    assert got[(10, 8)][2]        # first lit cell on the ray
    assert not got[(13, 8)][2]    # slope 20/5 < 30/2 horizon


def test_max_radius_and_tile_crossing(spark):
    cells = {(x, 3): 10 + (x % 3) for x in range(16)}
    cells[(0, 3)] = 60
    got = _run(spark, cells, (6, 3), max_radius=4)
    assert got == _brute(cells, (6, 3), max_radius=4)
    assert max(d for (d, _, _) in got.values()) <= 4
    # ray crosses the PX=4 tile boundary (gx 7 -> 8)
    assert (8, 3) in got and (2, 3) in got and (1, 3) not in got


def test_errors(spark):
    cells = {(1, 1): 5, (2, 2): 9}
    with pytest.raises(ValueError, match="not lit"):
        _run(spark, cells, (3, 3))
    with pytest.raises(ValueError, match="outside"):
        _run(spark, cells, (99, 0))
    with pytest.raises(ValueError, match="max_radius"):
        _run(spark, cells, (1, 1), max_radius=0)
    dup = _pix_df(spark, cells).union(_pix_df(spark, {(1, 1): 5}))
    with pytest.raises(ValueError, match="more than once"):
        viewshed_los(dup, _obs(1, 1), CFG, px=PX)
