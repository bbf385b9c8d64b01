"""raster_vector_join (box vs convex polygon, exact SAT) vs numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.raster import raster_vector_join
from tests.conftest import boxes_df, rand_boxes
from tests.test_knn_pip import _convex_polys, _polys_df

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3, strategy="sql")


def _sat_box_poly(box, ring) -> bool:
    """Numpy SAT oracle: AABB vs convex polygon, closed intervals."""
    bx0, by0, bx1, by1 = box
    # x / y axes
    if bx1 < ring[:, 0].min() or ring[:, 0].max() < bx0:
        return False
    if by1 < ring[:, 1].min() or ring[:, 1].max() < by0:
        return False
    v2 = np.roll(ring, -1, axis=0)
    corners = np.array([[bx0, by0], [bx0, by1], [bx1, by0], [bx1, by1]])
    for (x1, y1), (x2, y2) in zip(ring, v2):
        n = np.array([-(y2 - y1), x2 - x1])
        p = ring @ n
        b = corners @ n
        if b.max() < p.min() or p.max() < b.min():
            return False
    return True


@pytest.mark.parametrize("seed", [0, 3])
def test_raster_vector_join_oracle(spark, seed):
    polys = _convex_polys(30, 90 + seed)
    boxes = rand_boxes(400, 91 + seed, ext_max=8.0)
    rasters = boxes_df(spark, boxes, "image_id")
    got = {
        (r["image_id"], r["poly_id"])
        for r in raster_vector_join(rasters, _polys_df(spark, polys), CFG).collect()
    }
    exp = {
        (bi, pj)
        for bi, b in enumerate(boxes)
        for pj, ring in enumerate(polys)
        if _sat_box_poly(b, ring)
    }
    assert got == exp


def test_touching_box_polygon(spark):
    """A box touching a polygon edge intersects (closed intervals)."""
    ring = np.array([[2.0, 0.0], [4.0, 0.0], [3.0, 3.0]])  # CCW triangle
    box_touch = np.array([[0.0, 0.0, 2.0, 1.0]])           # touches vertex x=2
    box_miss = np.array([[0.0, 4.0, 1.0, 5.0]])
    polys = _polys_df(spark, [ring])
    got_t = raster_vector_join(boxes_df(spark, box_touch, "image_id"), polys, CFG).count()
    got_m = raster_vector_join(boxes_df(spark, box_miss, "image_id"), polys, CFG).count()
    assert got_t == 1 and got_m == 0


def test_d8_octant_partition(spark):
    """_d8_octant: every nonzero integer vector lands in exactly one
    octant and the octant contains its atan2 angle's 45-degree sector."""
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from python_prtree_spark.operators.raster import _d8_octant

    vecs = [(gx, gy) for gx in range(-4, 5) for gy in range(-4, 5)
            if (gx, gy) != (0, 0)]
    df = spark.createDataFrame(
        pd.DataFrame(vecs, columns=["gx", "gy"]), "gx long, gy long"
    )
    got = {
        (r["gx"], r["gy"]): r["oct"]
        for r in df.select("gx", "gy",
                           _d8_octant(F.col("gx"), F.col("gy")).alias("oct")
                           ).collect()
    }
    for gx, gy in vecs:
        ang = math.degrees(math.atan2(gy, gx)) % 360.0
        assert got[(gx, gy)] == int(ang // 45.0), (gx, gy, ang)


def test_slope_d8_brute_force(spark):
    """slope_d8 over a tiny sparse raster vs numpy convolution."""
    import numpy as np
    import pandas as pd

    from python_prtree_spark.config import EngineConfig, Extent
    from python_prtree_spark.operators.raster import SOBEL_X, SOBEL_Y, slope_d8

    cfg2 = EngineConfig(extent=Extent(0, 0, 100, 100), level=1)  # 2x2 tiles
    px = 4
    grid = 8
    rng = np.random.default_rng(12)
    dense = (rng.random((grid, grid)) < 0.3) * rng.integers(1, 9, (grid, grid))
    rows = []
    for gx in range(grid):
        for gy in range(grid):
            if dense[gy, gx]:
                rows.append((
                    (gx // px) * 2 + (gy // px), gy % px, gx % px,
                    int(dense[gy, gx]),
                ))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )
    out = {(r["tile"], r["r"], r["c"]): (r["gx"], r["gy"], r["slope2"], r["d8"])
           for r in slope_d8(df, cfg2, px=px).collect()}
    # numpy oracle: correlate with zero padding
    def conv(kern):
        k = np.array(kern)
        out = np.zeros_like(dense)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                # engine semantics: in[p-(dx,dy)] weighted k[1-dy][1-dx]
                # (correlation with kernel[0] = the row ABOVE), not the
                # flipped-kernel true convolution
                w = k[1 - dy, 1 - dx]
                if not w:
                    continue
                src = np.zeros_like(dense)
                ys = slice(max(0, dy), grid + min(0, dy))
                xs = slice(max(0, dx), grid + min(0, dx))
                ys2 = slice(max(0, -dy), grid + min(0, -dy))
                xs2 = slice(max(0, -dx), grid + min(0, -dx))
                src[ys, xs] = dense[ys2, xs2]
                out += w * src
        return out

    exp_gx, exp_gy = conv(SOBEL_X), conv(SOBEL_Y)
    n_checked = 0
    for gx in range(grid):
        for gy in range(grid):
            vx, vy = int(exp_gx[gy, gx]), int(exp_gy[gy, gx])
            key = ((gx // px) * 2 + (gy // px), gy % px, gx % px)
            if vx == 0 and vy == 0:
                assert key not in out
                continue
            got = out[key]
            assert got[0] == vx and got[1] == vy
            assert got[2] == vx * vx + vy * vy
            n_checked += 1
    assert n_checked > 10


def test_contour_cases_brute_force(spark):
    """contour_cases vs a dense numpy marching-squares case map."""
    import numpy as np
    import pandas as pd

    from python_prtree_spark.config import EngineConfig, Extent
    from python_prtree_spark.operators.raster import contour_cases

    cfg2 = EngineConfig(extent=Extent(0, 0, 100, 100), level=1)
    px, grid, thr = 4, 8, 3
    rng = np.random.default_rng(77)
    dense = (rng.random((grid, grid)) < 0.4) * rng.integers(1, 7, (grid, grid))
    rows = [
        ((gx // px) * 2 + (gy // px), gy % px, gx % px, int(dense[gy, gx]))
        for gx in range(grid) for gy in range(grid) if dense[gy, gx]
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile", "r", "c", "cnt"]),
        "tile long, r int, c int, cnt long",
    )
    got = {(r["wx"], r["wy"]): r["mcase"]
           for r in contour_cases(df, thr, cfg2, px=px).collect()}
    lit = dense >= thr
    exp = {}
    for wy in range(grid - 1):
        for wx in range(grid - 1):
            case = (int(lit[wy, wx]) | int(lit[wy, wx + 1]) << 1
                    | int(lit[wy + 1, wx]) << 2 | int(lit[wy + 1, wx + 1]) << 3)
            if 1 <= case <= 14:
                exp[(wx, wy)] = case
    assert got == exp and len(exp) > 5
