"""idw_grid (IDW surface interpolation) vs numpy brute force over the
full lattice: fixed-point term sums, closed radius predicate, sample
chunking, halo completeness at tile seams."""

from __future__ import annotations

import math

import numpy as np
import pytest

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.operators import interpolate as interp

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)
PX = 8
SIDE = 1 << CFG.level


def _df(spark, pts):
    return spark.createDataFrame(
        [(float(a), float(b), float(v)) for a, b, v in pts],
        "x double, y double, value double",
    )


def _oracle(pts, r):
    cw = 100.0 / SIDE
    out = {}
    r2 = r * r
    for tile in range(SIDE * SIDE):
        ix, iy = tile // SIDE, tile % SIDE
        for rr in range(PX):
            for cc in range(PX):
                pxc = 0.0 + ix * cw + (cc + 0.5) * (cw / PX)
                pyc = 0.0 + iy * cw + (rr + 0.5) * (cw / PX)
                n = d = 0
                for sx, sy, sv in pts:
                    d2 = (pxc - sx) * (pxc - sx) + (pyc - sy) * (pyc - sy)
                    if d2 <= r2:
                        w = 1.0 + d2
                        n += math.floor(sv * 1e6 / w)
                        d += math.floor(1e6 / w)
                if d > 0:
                    out[(tile, rr, cc)] = (n, d)
    return out


def _collect(df):
    return {
        (r["tile"], r["r"], r["c"]): (r["num_q"], r["den_q"])
        for r in df.collect()
    }


def test_idw_random_vs_oracle(spark):
    rng = np.random.default_rng(31)
    pts = [
        (rng.uniform(0, 100), rng.uniform(0, 100), rng.uniform(-5, 10))
        for _ in range(60)
    ]
    got = _collect(interp.idw_grid(_df(spark, pts), 4.0, CFG, px=PX))
    assert got == _oracle(pts, 4.0)
    assert len(got) > 0


def test_idw_chunking_matches_single_slab(spark, monkeypatch):
    rng = np.random.default_rng(32)
    pts = [
        (rng.uniform(40, 60), rng.uniform(40, 60), rng.uniform(0, 3))
        for _ in range(25)
    ]
    whole = _collect(interp.idw_grid(_df(spark, pts), 5.0, CFG, px=PX))
    monkeypatch.setattr(interp, "_CHUNK", 4)
    chunked = _collect(interp.idw_grid(_df(spark, pts), 5.0, CFG, px=PX))
    assert whole == chunked


def test_idw_sample_on_pixel_center_and_seam_halo(spark):
    # a sample exactly on a pixel center contributes v*1e6/1e6; a sample
    # right beside a tile seam must reach pixels in the NEIGHBOR tile
    cw = 100.0 / SIDE
    center0 = (0.5 * (cw / PX), 0.5 * (cw / PX))  # pixel (0,0,0) center
    seam = (cw - 1e-9, 50.0)                      # hugs tile border
    pts = [(center0[0], center0[1], 2.5), (seam[0], seam[1], 1.0)]
    got = _collect(interp.idw_grid(_df(spark, pts), 3.0, CFG, px=PX))
    assert got == _oracle(pts, 3.0)
    assert got[(0, 0, 0)][0] >= math.floor(2.5 * 1e6)  # exact-hit term present
    # neighbor tile east of the seam got contributions
    east_tile = 1 * SIDE + (SIDE // 2)
    assert any(t == east_tile for (t, _, _) in got)


def test_idw_rejects_bad_radius(spark):
    d = _df(spark, [(1.0, 1.0, 1.0)])
    with pytest.raises(ValueError, match="radius"):
        interp.idw_grid(d, 0.0, CFG)
    with pytest.raises(ValueError, match="radius"):
        interp.idw_grid(d, float("nan"), CFG)
