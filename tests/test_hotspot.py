"""Getis-Ord Gi* / local Moran's I hotspot stats vs dense numpy references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.hotspot import gi_star, local_moran

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=2, strategy="sql")
PX = 4  # side = 4 tiles -> grid = 16, n = 256


def _pixels_df(spark, cells):
    """cells: {(gx, gy): cnt} on the grid plane -> sparse (tile,r,c,cnt)."""
    side = 1 << CFG.level
    rows = [
        ((gx // PX) * side + (gy // PX), int(gy % PX), int(gx % PX), int(v))
        for (gx, gy), v in cells.items()
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )


def _dense_reference(cells, grid):
    """Dense-lattice Gi*: returns {(gx, gy): (w, fs, gi_q)} for every
    position whose 3x3 window holds at least one lit pixel."""
    x = np.zeros((grid, grid), dtype=np.int64)
    for (gx, gy), v in cells.items():
        x[gx, gy] = v
    n = float(grid * grid)
    mean = float(x.sum()) / n
    s = np.sqrt(float((x.astype(np.float64) ** 2).sum()) / n - mean * mean)
    out = {}
    for gx in range(grid):
        for gy in range(grid):
            x0, x1 = max(gx - 1, 0), min(gx + 1, grid - 1)
            y0, y1 = max(gy - 1, 0), min(gy + 1, grid - 1)
            win = x[x0:x1 + 1, y0:y1 + 1]
            if not (win != 0).any():
                continue
            w = win.size
            fs = int(win.sum())
            z = (float(fs) - mean * w) / (
                s * np.sqrt((n * w - float(w) * w) / (n - 1.0))
            )
            out[(gx, gy)] = (w, fs, int(np.floor(z * 1e6)))
    return out


def _collect(spark, cells):
    side = 1 << CFG.level
    got = {}
    for row in gi_star(_pixels_df(spark, cells), CFG, px=PX).collect():
        gx = (row["tile"] // side) * PX + row["c"]
        gy = (row["tile"] % side) * PX + row["r"]
        got[(gx, gy)] = (row["w"], row["fs"], row["gi_q"])
    return got


@pytest.mark.parametrize("seed", [0, 7])
def test_gi_star_matches_dense_reference(spark, seed):
    rng = np.random.default_rng(seed)
    grid = (1 << CFG.level) * PX
    cells = {
        (int(gx), int(gy)): int(v)
        for gx, gy, v in zip(
            rng.integers(0, grid, 60),
            rng.integers(0, grid, 60),
            rng.integers(1, 9, 60),
        )
    }
    got = _collect(spark, cells)
    exp = _dense_reference(cells, grid)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][:2] == exp[k][:2], k
        # one float ULP of slack between numpy's compound expression and
        # Spark's (the SQL oracle, not numpy, is the bit-exact twin)
        assert abs(got[k][2] - exp[k][2]) <= 1, (k, got[k], exp[k])


def test_gi_star_hotspot_sign(spark):
    """A dense cluster is hot (gi_q >> 0); the statistic is higher at the
    cluster core than at its dilated fringe."""
    cells = {(gx, gy): 9 for gx in range(4, 7) for gy in range(4, 7)}
    got = _collect(spark, cells)
    core = got[(5, 5)][2]
    fringe = got[(3, 3)][2]
    assert core > 0
    assert core > fringe
    # interior window sizes
    assert got[(5, 5)][0] == 9
    # corner clip: window at the lattice corner would be 4 — not emitted
    # here (no lit neighbor), but edge positions of the dilation clip
    assert all(w in (4, 6, 9) for w, _, _ in got.values())


def _dense_moran(cells, grid):
    """Dense-lattice LISA: {(gx, gy): (w, xi, fs, moran_q)} over the
    one-pixel dilation of the lit cells."""
    x = np.zeros((grid, grid), dtype=np.int64)
    for (gx, gy), v in cells.items():
        x[gx, gy] = v
    n = float(grid * grid)
    mean = float(x.sum()) / n
    var = float((x.astype(np.float64) ** 2).sum()) / n - mean * mean
    out = {}
    for gx in range(grid):
        for gy in range(grid):
            x0, x1 = max(gx - 1, 0), min(gx + 1, grid - 1)
            y0, y1 = max(gy - 1, 0), min(gy + 1, grid - 1)
            win = x[x0:x1 + 1, y0:y1 + 1]
            if not (win != 0).any():
                continue
            w, xi, fs = win.size, int(x[gx, gy]), int(win.sum())
            lag = (float(fs) - float(xi)) - mean * (w - 1.0)
            moran = ((float(xi) - mean) / var) * lag
            out[(gx, gy)] = (w, xi, fs, int(np.floor(moran * 1e6)))
    return out


def _collect_moran(spark, cells):
    side = 1 << CFG.level
    got = {}
    rows = local_moran(_pixels_df(spark, cells), CFG, px=PX).collect()
    for row in rows:
        gx = (row["tile"] // side) * PX + row["c"]
        gy = (row["tile"] % side) * PX + row["r"]
        got[(gx, gy)] = (row["w"], row["xi"], row["fs"], row["moran_q"])
    return got


@pytest.mark.parametrize("seed", [0, 7])
def test_local_moran_matches_dense_reference(spark, seed):
    rng = np.random.default_rng(seed)
    grid = (1 << CFG.level) * PX
    cells = {
        (int(gx), int(gy)): int(v)
        for gx, gy, v in zip(
            rng.integers(0, grid, 60),
            rng.integers(0, grid, 60),
            rng.integers(1, 9, 60),
        )
    }
    got = _collect_moran(spark, cells)
    exp = _dense_moran(cells, grid)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][:3] == exp[k][:3], k
        # one ULP of slack vs numpy; the SQL oracle is the bit-exact twin
        assert abs(got[k][3] - exp[k][3]) <= 1, (k, got[k], exp[k])


def test_local_moran_cluster_vs_outlier_sign(spark):
    """LISA separates clusters from outliers: a cell inside a uniform
    high block gets I > 0 (high among high); an isolated high cell in an
    empty neighborhood gets I < 0 (high among low) — the distinction
    Gi* cannot make."""
    cluster = {(gx, gy): 9 for gx in range(4, 7) for gy in range(4, 7)}
    outlier = {(12, 12): 9}
    got = _collect_moran(spark, {**cluster, **outlier})
    assert got[(5, 5)][3] > 0  # cluster core: high cell, high neighbors
    assert got[(12, 12)][3] < 0  # spatial outlier: high cell, zero lag
    # xi is recovered exactly from the conditional sum
    assert got[(5, 5)][1] == 9 and got[(4, 4)][1] == 9
    assert got[(3, 3)][1] == 0  # fringe position: unlit center
