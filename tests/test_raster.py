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
