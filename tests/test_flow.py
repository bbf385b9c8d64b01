"""flow_direction_d8 / flow_accumulation vs a brute-force witness."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import (
    _D8,
    flow_accumulation,
    flow_direction_d8,
)

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


def _gxy(row):
    side = 1 << CFG.level
    return ((row["tile"] // side) * PX + row["c"],
            (row["tile"] % side) * PX + row["r"])


def _brute_dirs(cells):
    out = {}
    for (gx, gy), e in cells.items():
        best = None
        for dx, dy, d in _D8:
            p = (gx + dx, gy + dy)
            if p not in cells or cells[p] >= e:
                continue
            drop = e - cells[p]
            key = drop * drop * (2 if d in (0, 2, 4, 6) else 1)
            cand = (key, -d)
            if best is None or cand > best[0]:
                best = (cand, d, p)
        out[(gx, gy)] = (-1, None) if best is None else (best[1], best[2])
    return out


def _brute_acc(cells):
    dirs = _brute_dirs(cells)
    acc = {p: 1 for p in cells}
    for p in cells:
        cur = p
        while dirs[cur][1] is not None:
            cur = dirs[cur][1]
            acc[cur] += 1
    return acc


def _terrain():
    # bowl with a ridge and holes: varied drops, diagonals, a flat pair
    cells = {}
    for x in range(16):
        for y in range(16):
            if (x * 5 + y * 11) % 29 == 0:
                continue  # holes
            v = (x - 6) * (x - 6) + 2 * (y - 9) * (y - 9) + (x * y) % 3
            cells[(x, y)] = v
    return cells


def test_directions_vs_brute(spark):
    cells = _terrain()
    want = _brute_dirs(cells)
    got = {}
    for row in flow_direction_d8(_pix_df(spark, cells), CFG, px=PX).collect():
        p = _gxy(row)
        tgt = None
        if row["dir"] >= 0:
            side = 1 << CFG.level
            tgt = ((row["acc_tile"] // side) * PX + row["acc_c"],
                   (row["acc_tile"] % side) * PX + row["acc_r"])
        got[p] = (row["dir"], tgt)
    assert got == want
    assert any(d == -1 for d, _ in got.values())      # has pits
    assert any(d in (1, 3, 5, 7) for d, _ in got.values())  # diagonals used


def test_accumulation_vs_brute(spark):
    cells = _terrain()
    got = {
        _gxy(row): row["acc"]
        for row in flow_accumulation(_pix_df(spark, cells), CFG, px=PX).collect()
    }
    want = _brute_acc(cells)
    assert got == want
    assert sum(got.values()) > len(cells)  # real upstream mass moved


def test_diagonal_vs_cardinal_steepness(spark):
    # drop 3 on the diagonal vs drop 2 cardinal: slope^2 keys are
    # 9 (diag) vs 8 (card) -> diagonal wins despite sqrt(2) distance;
    # drop 2 diag vs drop 2 card: 4 vs 8 -> cardinal wins.
    cells = {(5, 5): 10, (6, 5): 8, (6, 6): 7}
    dirs = _brute_dirs(cells)
    assert dirs[(5, 5)][1] == (6, 6)
    cells2 = {(5, 5): 10, (6, 5): 8, (6, 6): 8}
    assert _brute_dirs(cells2)[(5, 5)][1] == (6, 5)
    for c in (cells, cells2):
        got = {}
        for row in flow_direction_d8(_pix_df(spark, c), CFG, px=PX).collect():
            got[_gxy(row)] = row["dir"]
        assert got == {p: d for p, (d, _) in _brute_dirs(c).items()}


def test_single_chain_counts(spark):
    # strictly descending staircase: acc = position along the chain
    cells = {(x, 2): 100 - x for x in range(8)}
    got = {
        _gxy(row): row["acc"]
        for row in flow_accumulation(_pix_df(spark, cells), CFG, px=PX).collect()
    }
    assert got == {(x, 2): x + 1 for x in range(8)}


def test_flat_plateau_all_pits(spark):
    cells = {(x, y): 5 for x in range(4) for y in range(4)}
    rows = flow_direction_d8(_pix_df(spark, cells), CFG, px=PX).collect()
    assert all(r["dir"] == -1 for r in rows)
    acc = flow_accumulation(_pix_df(spark, cells), CFG, px=PX).collect()
    assert all(r["acc"] == 1 for r in acc)


def test_max_rounds_raises(spark):
    cells = {(x, 2): 100 - x for x in range(8)}
    with pytest.raises(RuntimeError, match="converge"):
        flow_accumulation(_pix_df(spark, cells), CFG, px=PX, max_rounds=3)
    with pytest.raises(ValueError, match="max_rounds"):
        flow_accumulation(_pix_df(spark, cells), CFG, px=PX, max_rounds=0)


def _brute_basins(cells):
    dirs = _brute_dirs(cells)
    out = {}
    for p in cells:
        cur = p
        while dirs[cur][1] is not None:
            cur = dirs[cur][1]
        out[p] = cur[1] * 16 + cur[0]  # gy * grid + gx, grid = 16
    return out


def test_basins_vs_brute(spark):
    from python_prtree_spark.operators.raster import watershed_basins

    for cells in (_terrain(), _two_bowls()):
        got = {
            _gxy(row): row["basin"]
            for row in watershed_basins(
                _pix_df(spark, cells), CFG, px=PX).collect()
        }
        assert got == _brute_basins(cells)
    assert len(set(got.values())) > 1  # two bowls -> multiple catchments


def _two_bowls():
    # two separate depressions split by the x=8 ridge
    cells = {}
    for x in range(16):
        for y in range(16):
            if (x * 3 + y * 7) % 31 == 0:
                continue  # holes
            cx = 3 if x < 8 else 12
            cells[(x, y)] = (x - cx) * (x - cx) + (y - 8) * (y - 8) + (
                x * y) % 2
    return cells


def test_basins_doubling_rounds(spark):
    from python_prtree_spark.operators.raster import watershed_basins

    # chain of length 8: pointer doubling needs ceil(log2(8)) = 3 rounds
    # (+1 stable confirmation), so max_rounds=4 converges where per-hop
    # walking would need 8.
    cells = {(x, 2): 100 - x for x in range(9)}
    got = {
        _gxy(row): row["basin"]
        for row in watershed_basins(
            _pix_df(spark, cells), CFG, px=PX, max_rounds=4).collect()
    }
    assert set(got.values()) == {2 * 16 + 8}  # everyone drains to (8,2)
    with pytest.raises(ValueError, match="max_rounds"):
        watershed_basins(_pix_df(spark, cells), CFG, px=PX, max_rounds=0)
