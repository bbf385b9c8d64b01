"""polygon_area_centroid vs known shapes and a brute-force shoelace."""

from __future__ import annotations

import pandas as pd
import pytest

from python_prtree_spark.operators.polygon import polygon_area_centroid


def _df(spark, polys):
    rows = [(pid, [{"x": int(x), "y": int(y)} for x, y in ring])
            for pid, ring in polys.items()]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["poly_id", "ring"]),
        "poly_id long, ring array<struct<x: long, y: long>>",
    )


def _brute(ring):
    n = len(ring)
    a2 = cx6 = cy6 = 0
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        cr = x0 * y1 - x1 * y0
        a2 += cr
        cx6 += (x0 + x1) * cr
        cy6 += (y0 + y1) * cr
    return n, a2, cx6, cy6


POLYS = {
    1: [(0, 0), (4, 0), (4, 4), (0, 4)],          # CCW unit-ish square
    2: [(0, 0), (0, 4), (4, 4), (4, 0)],          # CW (negative area)
    3: [(0, 0), (6, 0), (3, 9)],                  # triangle
    4: [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)],  # L (concave)
    5: [(-10, -10), (-2, -10), (-2, -3), (-10, -3)],      # negative coords
}


def test_vs_brute(spark):
    out = polygon_area_centroid(_df(spark, POLYS))
    got = {r["poly_id"]: (r["n_verts"], r["area2"], r["cx6"], r["cy6"])
           for r in out.collect()}
    assert got == {pid: _brute(ring) for pid, ring in POLYS.items()}


def test_known_values(spark):
    out = polygon_area_centroid(_df(spark, POLYS))
    got = {r["poly_id"]: r for r in out.collect()}
    # square 4x4: area2 = 32, centroid (2, 2) -> cx6 = 3*area2*2 = 192
    assert got[1]["area2"] == 32
    assert got[1]["cx6"] == 192 and got[1]["cy6"] == 192
    # CW orientation flips every sign
    assert got[2]["area2"] == -32
    assert got[2]["cx6"] == -192 and got[2]["cy6"] == -192
    # triangle: area = 27 -> area2 = 54; centroid (3, 3)
    assert got[3]["area2"] == 54
    assert got[3]["cx6"] == 3 * 54 * 3 and got[3]["cy6"] == 3 * 54 * 3
    # L-shape: area = 12 -> area2 = 24; centroid = (5/3, 5/3) exact:
    # cx6 = 3 * 24 * 5/3 = 120
    assert got[4]["area2"] == 24
    assert got[4]["cx6"] == 120 and got[4]["cy6"] == 120


def test_centroid_translation_invariance(spark):
    # translating by (t, t) shifts the centroid by exactly t
    t = 1000
    moved = {pid: [(x + t, y + t) for x, y in ring]
             for pid, ring in POLYS.items()}
    a = {r["poly_id"]: r for r in
         polygon_area_centroid(_df(spark, POLYS)).collect()}
    b = {r["poly_id"]: r for r in
         polygon_area_centroid(_df(spark, moved)).collect()}
    for pid in POLYS:
        assert b[pid]["area2"] == a[pid]["area2"]
        a2 = a[pid]["area2"]
        assert b[pid]["cx6"] == a[pid]["cx6"] + 3 * a2 * t
        assert b[pid]["cy6"] == a[pid]["cy6"] + 3 * a2 * t
