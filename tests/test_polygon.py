"""Polygon–polygon intersection join vs a brute-force scalar oracle
(closed semantics: boundary contact counts). Star-shaped random polygons
exercise the nonconvex raycast containment; convex mode runs on convex
rings only (its documented precondition)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators.polygon import polygon_join

EXT = Extent(0, 0, 120, 120)
CFG = EngineConfig(extent=EXT, level=3)


# ---------------------------------------------------------------------------
# scalar oracle (independent re-derivation of the closed predicate)
# ---------------------------------------------------------------------------

def _cross(o, p, q):
    return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])


def _on(p, q, r):
    return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))


def _seg(p1, p2, q1, q2):
    d1 = _cross(q1, q2, p1)
    d2 = _cross(q1, q2, p2)
    d3 = _cross(p1, p2, q1)
    d4 = _cross(p1, p2, q2)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and \
       ((d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)):
        return True
    return ((d1 == 0 and _on(q1, q2, p1)) or (d2 == 0 and _on(q1, q2, p2))
            or (d3 == 0 and _on(p1, p2, q1)) or (d4 == 0 and _on(p1, p2, q2)))


def _pip(pt, ring):
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > pt[1]) != (y2 > pt[1]) and \
                pt[0] < (x2 - x1) * (pt[1] - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _polys_intersect(ra, rb):
    na, nb = len(ra), len(rb)
    for i in range(na):
        for j in range(nb):
            if _seg(ra[i], ra[(i + 1) % na], rb[j], rb[(j + 1) % nb]):
                return True
    return _pip(ra[0], rb) or _pip(rb[0], ra)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _star_polys(n, seed, convex=False):
    """Star-shaped (simple, CCW) rings; constant radius → convex regular."""
    rng = np.random.default_rng(seed)
    rings = []
    for _ in range(n):
        nv = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = np.full(nv, rng.uniform(2, 7)) if convex else rng.uniform(1.5, 7, nv)
        c = rng.uniform(10, 110, 2)
        xs = c[0] + rad * np.cos(ang)
        ys = c[1] + rad * np.sin(ang)
        rings.append(list(zip(xs.tolist(), ys.tolist())))
    return rings


def _poly_df(spark, rings, pid):
    rows = []
    for i, ring in enumerate(rings):
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        rows.append((i, [{"x": float(x), "y": float(y)} for x, y in ring],
                     min(xs), min(ys), max(xs), max(ys)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[pid, "ring", "xmin", "ymin", "xmax", "ymax"]),
        schema=f"{pid} long, ring array<struct<x double, y double>>, "
               "xmin double, ymin double, xmax double, ymax double",
    )


@pytest.mark.parametrize("mode,convex", [("raycast", False), ("convex", True)])
def test_polygon_join_matches_oracle(spark, mode, convex):
    ra = _star_polys(40, 71, convex=convex)
    rb = _star_polys(30, 72, convex=convex)
    got = set(
        (r["a_id"], r["b_id"])
        for r in polygon_join(_poly_df(spark, ra, "a_id"),
                              _poly_df(spark, rb, "b_id"), CFG, mode=mode).collect()
    )
    want = set(
        (i, j) for i in range(len(ra)) for j in range(len(rb))
        if _polys_intersect(ra[i], rb[j])
    )
    assert got == want
    assert len(want) > 10  # fixture sanity: the case is non-trivial


def test_polygon_join_containment_and_touch(spark):
    """Hand-built cases: strict containment both ways, edge touch, corner
    touch, disjoint."""
    big = [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0)]
    small = [(5.0, 5.0), (8.0, 5.0), (8.0, 8.0), (5.0, 8.0)]
    edge_touch = [(20.0, 5.0), (30.0, 5.0), (30.0, 15.0), (20.0, 15.0)]
    corner_touch = [(20.0, 20.0), (25.0, 20.0), (25.0, 25.0), (20.0, 25.0)]
    far = [(50.0, 50.0), (60.0, 50.0), (60.0, 60.0), (50.0, 60.0)]
    a = _poly_df(spark, [big], "a_id")
    b = _poly_df(spark, [small, edge_touch, corner_touch, far], "b_id")
    for mode in ("raycast", "convex"):
        got = set(
            (r["a_id"], r["b_id"])
            for r in polygon_join(a, b, CFG, mode=mode).collect()
        )
        assert got == {(0, 0), (0, 1), (0, 2)}, (mode, got)


def test_polygon_join_rejects_bad_mode(spark):
    a = _poly_df(spark, [[(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]], "a_id")
    with pytest.raises(ValueError):
        polygon_join(a, a, CFG, mode="winding")
