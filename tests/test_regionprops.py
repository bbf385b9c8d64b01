"""region_shape_stats / label_regions vs a brute-force flood fill."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import (
    label_regions,
    polygonize_regions,
    region_shape_stats,
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


def _flood(cells, threshold=1):
    lit = {p for p, v in cells.items() if v >= threshold}
    labels = {}
    for seed in lit:
        if seed in labels:
            continue
        comp, stack = [], [seed]
        seen = {seed}
        while stack:
            p = stack.pop()
            comp.append(p)
            for q in ((p[0] + 1, p[1]), (p[0] - 1, p[1]),
                      (p[0], p[1] + 1), (p[0], p[1] - 1)):
                if q in lit and q not in seen:
                    seen.add(q)
                    stack.append(q)
        rid = min(x * 16 + y for x, y in comp)
        for p in comp:
            labels[p] = rid
        for p in comp:
            if p in labels and labels[p] != rid:
                raise AssertionError
    return labels


def _brute_stats(cells, threshold=1):
    labels = _flood(cells, threshold)
    out = {}
    for (x, y), rid in labels.items():
        s = out.setdefault(rid, [0, 0, 0, 0, 99, 99, -1, -1])
        s[0] += 1
        s[2] += x
        s[3] += y
        s[4] = min(s[4], x)
        s[5] = min(s[5], y)
        s[6] = max(s[6], x)
        s[7] = max(s[7], y)
        for q in ((x + 1, y), (x, y + 1)):
            if q in labels:
                s[1] += 1
    return {
        rid: (n, 4 * n - 2 * adj, sgx, sgy, x0, y0, x1, y1)
        for rid, (n, adj, sgx, sgy, x0, y0, x1, y1) in out.items()
    }


CELLS = {(x, y): 1 + (x + 2 * y) % 4
         for x in range(16) for y in range(16)
         if (x * 3 + y * 7) % 6 != 0 and y != 8}  # y=8 gap splits regions


def test_labels_vs_flood(spark):
    got = {(r["gx"], r["gy"]): r["region_id"]
           for r in label_regions(_pix_df(spark, CELLS), CFG, px=PX).collect()}
    assert got == _flood(CELLS)


def test_shape_stats_vs_brute(spark):
    out = region_shape_stats(_pix_df(spark, CELLS), CFG, px=PX)
    got = {r["region_id"]: (r["n_px"], r["perim"], r["sgx"], r["sgy"],
                            r["gx0"], r["gy0"], r["gx1"], r["gy1"])
           for r in out.collect()}
    assert got == _brute_stats(CELLS)
    assert len(got) > 1


def test_known_shapes(spark):
    # 3x3 square: perim 12; plus an L-tromino: perim 8; isolated px: 4
    cells = {(x, y): 5 for x in range(2, 5) for y in range(2, 5)}
    cells.update({(10, 10): 5, (11, 10): 5, (10, 11): 5})
    cells[(0, 15)] = 5
    out = region_shape_stats(_pix_df(spark, cells), CFG, px=PX)
    got = {r["region_id"]: (r["n_px"], r["perim"]) for r in out.collect()}
    assert got == {2 * 16 + 2: (9, 12), 10 * 16 + 10: (3, 8),
                   0 * 16 + 15: (1, 4)}


def test_polygonize_unchanged_by_refactor(spark):
    # polygonize_regions must still agree with stats on count/bbox
    poly = {r["region_id"]: (r["n_px"], r["gx0"], r["gy0"], r["gx1"], r["gy1"])
            for r in polygonize_regions(
                _pix_df(spark, CELLS), CFG, px=PX).collect()}
    stats = {r["region_id"]: (r["n_px"], r["gx0"], r["gy0"], r["gx1"], r["gy1"])
             for r in region_shape_stats(
                 _pix_df(spark, CELLS), CFG, px=PX).collect()}
    assert poly == stats


def test_threshold_respected(spark):
    got = {(r["gx"], r["gy"]): r["region_id"]
           for r in label_regions(
               _pix_df(spark, CELLS), CFG, px=PX, threshold=3).collect()}
    assert got == _flood(CELLS, threshold=3)
    assert got  # some pixels survive
