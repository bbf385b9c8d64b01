"""cost_distance vs a driver-side Dijkstra reference."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import cost_distance

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # grid = 16


def _dfs(spark, cells, sources):
    side = 1 << CFG.level

    def rows(d):
        return [
            ((gx // PX) * side + (gy // PX), int(gy % PX), int(gx % PX))
            + rest
            for (gx, gy), rest in d
        ]

    pix = spark.createDataFrame(
        pd.DataFrame(
            rows([(k, (int(v),)) for k, v in cells.items()]),
            columns=["tile", "r", "c", "cnt"],
        ),
        "tile long, r int, c int, cnt long",
    )
    src = spark.createDataFrame(
        pd.DataFrame(rows([(k, ()) for k in sources]),
                     columns=["tile", "r", "c"]),
        "tile long, r int, c int",
    )
    return pix, src


def _dijkstra(cells, sources):
    dist = {s: 0 for s in sources}
    heap = [(0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        d, (gx, gy) = heapq.heappop(heap)
        if d > dist.get((gx, gy), 1 << 62):
            continue
        for nb in ((gx - 1, gy), (gx + 1, gy), (gx, gy - 1), (gx, gy + 1)):
            if nb not in cells:
                continue
            nd = d + cells[(gx, gy)] + cells[nb]
            if nd < dist.get(nb, 1 << 62):
                dist[nb] = nd
                heapq.heappush(heap, (nd, nb))
    return dist


def _collect(spark, cells, sources, **kw):
    side = 1 << CFG.level
    out = {}
    res = cost_distance(*_dfs(spark, cells, sources), CFG, px=PX, **kw)
    for row in res.collect():
        gx = (row["tile"] // side) * PX + row["c"]
        gy = (row["tile"] % side) * PX + row["r"]
        out[(gx, gy)] = row["dist"]
    return out


@pytest.mark.parametrize("seed", [0, 13])
def test_cost_distance_matches_dijkstra(spark, seed):
    rng = np.random.default_rng(seed)
    grid = (1 << CFG.level) * PX
    cells = {
        (int(gx), int(gy)): int(v)
        for gx, gy, v in zip(
            rng.integers(0, grid, 150),
            rng.integers(0, grid, 150),
            rng.integers(1, 9, 150),
        )
    }
    sources = list(cells)[:3]
    got = _collect(spark, cells, sources)
    assert got == _dijkstra(cells, sources)


def test_cost_distance_walls_block(spark):
    """A corridor around an unlit wall: the path must detour, and cells
    sealed off entirely are absent from the output."""
    cells = {(gx, 0): 1 for gx in range(6)}          # bottom corridor
    cells.update({(5, gy): 1 for gy in range(4)})    # right column up
    cells.update({(gx, 3): 1 for gx in range(6)})    # top corridor
    cells[(8, 8)] = 7                                # truly isolated cell
    got = _collect(spark, cells, [(0, 0)])
    exp = _dijkstra(cells, [(0, 0)])
    assert got == exp
    assert (8, 8) not in got        # no lit neighbor: unreachable
    # (0,3) is straight above the source but (0,1)/(0,2) are unlit —
    # the only path is the full U: 5+3+5 hops of cost 2 each
    assert got[(0, 3)] == 26


def test_cost_distance_source_is_zero_and_weights_matter(spark):
    cells = {(0, 0): 1, (1, 0): 5, (2, 0): 1, (0, 1): 1, (1, 1): 1,
             (2, 1): 1}
    got = _collect(spark, cells, [(0, 0)])
    assert got[(0, 0)] == 0
    # via the cost-5 cell: (1+5) + (5+1) = 12; around through the
    # cost-1 row: four hops of cost 2 = 8 — weights steer the path
    assert got[(2, 0)] == 8


def test_cost_distance_rejects_bad_inputs(spark):
    pix, src = _dfs(spark, {(0, 0): 1}, [(0, 0)])
    with pytest.raises(ValueError):
        cost_distance(pix, src, CFG, px=PX, max_rounds=0)
    bad, _ = _dfs(spark, {(0, 0): 0}, [(0, 0)])
    with pytest.raises(ValueError, match="cost"):
        cost_distance(bad, src, CFG, px=PX)
    _, off = _dfs(spark, {(0, 0): 1}, [(3, 3)])
    with pytest.raises(ValueError, match="source"):
        cost_distance(pix, off, CFG, px=PX)


def test_cost_distance_max_rounds_raises(spark):
    cells = {(gx, 0): 1 for gx in range(10)}
    with pytest.raises(RuntimeError, match="converge"):
        _collect(spark, cells, [(0, 0)], max_rounds=3)
