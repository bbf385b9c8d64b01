"""North-rule extensions: kNN join and point-in-polygon join, each vs an
exact numpy oracle (FIXTURES.md F5/F6)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from python_prtree_spark import EngineConfig, Extent, knn_join, point_in_polygon_join
from tests.conftest import boxes_df, rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3, strategy="sql")


def _knn_oracle(boxes, pts, k):
    cent = (boxes[:, :2] + boxes[:, 2:]) / 2
    out = set()
    for qi, p in enumerate(pts):
        d2 = ((cent - p) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(cent)), d2))
        for rank, di in enumerate(order[:k], start=1):
            out.add((qi, int(di), rank))
    return out


@pytest.mark.parametrize("k", [1, 5, 50])
@pytest.mark.parametrize("route", ["broadcast", "radius"])
def test_knn_oracle(spark, k, route, monkeypatch):
    """Both physical routes — single-scan broadcast top-k (tiny probes)
    and expanding-radius rounds — must produce identical exact results."""
    if route == "radius":  # force the loop even for a tiny probe batch
        from python_prtree_spark.operators import knn as knn_mod

        monkeypatch.setattr(knn_mod, "_BCAST_PROBE_BYTES", 0)
    boxes = rand_boxes(800, 31, ext_max=2.0)
    rng = np.random.default_rng(32)
    pts = rng.random((60, 2)) * 100
    pts_df = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(pts)), "x": pts[:, 0], "y": pts[:, 1]}),
        schema="qid long, x double, y double",
    )
    got = set(
        (r["qid"], r["id"], r["rank"])
        for r in knn_join(boxes_df(spark, boxes), pts_df, k, CFG).collect()
    )
    assert got == _knn_oracle(boxes, pts, k)


def test_knn_k_exceeds_n(spark):
    boxes = rand_boxes(10, 33)
    pts = np.array([[50.0, 50.0], [0.0, 0.0]])
    pts_df = spark.createDataFrame(
        pd.DataFrame({"qid": [0, 1], "x": pts[:, 0], "y": pts[:, 1]}),
        schema="qid long, x double, y double",
    )
    got = set(
        (r["qid"], r["id"], r["rank"])
        for r in knn_join(boxes_df(spark, boxes), pts_df, 25, CFG).collect()
    )
    assert got == _knn_oracle(boxes, pts, 25)
    assert len(got) == 20  # 10 per probe


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------

def _convex_polys(n, seed):
    """Seeded convex rings (CCW): jittered circles (FIXTURES.md F5)."""
    rng = np.random.default_rng(seed)
    polys = []
    for _ in range(n):
        nv = rng.integers(5, 13)
        cx, cy = rng.random(2) * 100
        r = rng.random() * 9 + 1
        ang = np.sort(rng.random(nv) * 2 * np.pi)
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang)
        polys.append(np.column_stack([xs, ys]))
    return polys


def _pip_oracle_convex(polys, pts):
    out = set()
    for pj, ring in enumerate(polys):
        v1 = ring
        v2 = np.roll(ring, -1, axis=0)
        for pi, (px, py) in enumerate(pts):
            cross = (v2[:, 0] - v1[:, 0]) * (py - v1[:, 1]) - (v2[:, 1] - v1[:, 1]) * (px - v1[:, 0])
            if (cross >= 0).all():
                out.add((pi, pj))
    return out


def _polys_df(spark, polys):
    rows = []
    for j, ring in enumerate(polys):
        rows.append((
            j,
            [{"x": float(x), "y": float(y)} for x, y in ring],
            float(ring[:, 0].min()), float(ring[:, 1].min()),
            float(ring[:, 0].max()), float(ring[:, 1].max()),
        ))
    return spark.createDataFrame(
        rows,
        "poly_id long, ring array<struct<x double, y double>>, "
        "xmin double, ymin double, xmax double, ymax double",
    )


@pytest.mark.parametrize("mode", ["convex", "raycast"])
def test_pip_oracle(spark, mode):
    polys = _convex_polys(40, 35)
    rng = np.random.default_rng(36)
    pts = rng.random((400, 2)) * 100
    pts_df = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(len(pts)), "x": pts[:, 0], "y": pts[:, 1]}),
        schema="pid long, x double, y double",
    )
    got = set(
        (r["pid"], r["poly_id"])
        for r in point_in_polygon_join(_polys_df(spark, polys), pts_df, CFG, mode=mode).collect()
    )
    exp = _pip_oracle_convex(polys, pts)
    if mode == "convex":
        assert got == exp
    else:
        # raycast uses the half-open boundary rule; interior points agree.
        # with random points boundary hits have measure zero → equal sets
        assert got == exp
