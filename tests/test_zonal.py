"""zonal_stats (pixel-level raster↔vector aggregation) vs numpy oracle.

The oracle decodes the SAME bytes driver-side (real raw/png/lossy codecs)
and brute-forces every (tile, zone) pair — no candidate pruning — so the
operator's SAT prefilter, decode-once grouping, masking convention and
partial-aggregation pipeline are all checked end-to-end."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.functions.codec import decode_image, encode_image
from python_prtree_spark.operators.raster import zonal_stats
from python_prtree_spark.sources.datagen import (
    _FT_FMTS,
    _FT_HS,
    _FT_WS,
    _formula_pixels,
    formula_tiles,
    image_table,
)
from tests.test_knn_pip import _convex_polys, _polys_df

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)


def _zonal_oracle(tiles, polys):
    """tiles: [(pixels, (x0, y0, x1, y1))]; polys: [ring (n,2)].
    → {poly_idx: (n_px, sum, min, max)} over inclusive pixel-center PIP."""
    agg = {}
    for px, (x0, y0, x1, y1) in tiles:
        h, w = px.shape[:2]
        xc = x0 + (np.arange(w) + 0.5) * ((x1 - x0) / w)
        yc = y0 + (np.arange(h) + 0.5) * ((y1 - y0) / h)
        X, Y = xc[None, :], yc[:, None]
        for pj, ring in enumerate(polys):
            v2 = np.roll(ring, -1, axis=0)
            mask = np.ones((h, w), dtype=bool)
            for (vx, vy), (ux, uy) in zip(ring, v2):
                mask &= (ux - vx) * (Y - vy) - (uy - vy) * (X - vx) >= 0
            n = int(mask.sum())
            if n == 0:
                continue
            vals = px[mask]
            e = (n, int(vals.sum(dtype=np.int64)), int(vals.min()), int(vals.max()))
            c = agg.get(pj)
            agg[pj] = e if c is None else (
                c[0] + e[0], c[1] + e[1], min(c[2], e[2]), max(c[3], e[3])
            )
    return agg


def _check(got_rows, agg):
    got = {r["poly_id"]: r for r in got_rows}
    assert set(got) == set(agg)
    for pj, (n, s, mn, mx) in agg.items():
        r = got[pj]
        assert (r["n_px"], r["sum_val"], r["min_val"], r["max_val"]) == (n, s, mn, mx)
        assert r["mean_val"] == s / (3 * n)


def test_zonal_formula_tiles(spark):
    """Formula tiles (the DuckDB-gated fixture): all three codecs decode to
    the closed-form pixel values; zonal aggregates match brute force."""
    ids = spark.range(0, 60)
    polys = _convex_polys(25, 7)
    got = zonal_stats(formula_tiles(ids), _polys_df(spark, polys), CFG).collect()
    tiles = []
    for tid in range(60):
        w, h = _FT_WS[tid % 3], _FT_HS[tid % 3]
        fmt = _FT_FMTS[(tid // 3) % 3]
        x0 = float((tid * 2654435761) % 90000) / 1000.0 + 2.0
        y0 = float((tid * 2246822519) % 90000) / 1000.0 + 2.0
        px = decode_image(encode_image(_formula_pixels(tid, w, h), fmt))
        tiles.append((px, (x0, y0, x0 + w * 0.125, y0 + h * 0.125)))
    _check(got, _zonal_oracle(tiles, polys))


def test_zonal_real_image_table(spark):
    """PCG image table: footprints extend past the configured extent
    (border-cell clamping path) and bytes mix raw/png/lossy."""
    imgs = image_table(spark, 40)
    polys = _convex_polys(15, 11)
    tiles_df = imgs.select(
        F.col("id").alias("image_id"), "bytes", "xmin", "ymin", "xmax", "ymax"
    )
    got = zonal_stats(tiles_df, _polys_df(spark, polys), CFG).collect()
    pdf = imgs.select("bytes", "xmin", "ymin", "xmax", "ymax").toPandas()
    tiles = [
        (decode_image(bytes(b)), (x0, y0, x1, y1))
        for b, x0, y0, x1, y1 in pdf.itertuples(index=False)
    ]
    _check(got, _zonal_oracle(tiles, polys))


def test_zonal_boundary_pixel_inclusive(spark):
    """A pixel center exactly ON a zone edge counts (closed boundary —
    same convention as point_in_polygon_join); a zone whose overlap
    contains no pixel center is absent from the output."""
    import pandas as pd

    px = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)  # 1x2 RGB
    tiles_df = spark.createDataFrame(
        pd.DataFrame({
            "image_id": [0], "bytes": [encode_image(px, "raw")],
            "xmin": [0.0], "ymin": [0.0], "xmax": [2.0], "ymax": [1.0],
        }),
        "image_id long, bytes binary, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    # CCW triangle with a vertical edge through x=0.5: pixel center
    # (0.5, 0.5) lies exactly on it → inside; (1.5, 0.5) is outside.
    ring = np.array([[0.5, 1.0], [0.5, 0.0], [1.5, 1.0]])
    out = zonal_stats(tiles_df, _polys_df(spark, [ring]), CFG).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["poly_id"], r["n_px"], r["sum_val"], r["min_val"], r["max_val"]) \
        == (0, 1, 60, 10, 30)
    # zone overlapping the footprint but missing every pixel center
    far = np.array([[1.9, 0.9], [2.6, 0.9], [2.2, 1.6]])
    assert zonal_stats(tiles_df, _polys_df(spark, [far]), CFG).count() == 0


def test_zonal_histogram_formula_tiles(spark):
    """zonal_histogram vs brute force on the same formula-tile fixture:
    per-zone per-bin channel-sample counts, 8 uint8 buckets."""
    from python_prtree_spark.operators.raster import zonal_histogram

    ids = spark.range(0, 60)
    polys = _convex_polys(25, 9)
    got = {
        (r["poly_id"], r["bin"]): r["n_samples"]
        for r in zonal_histogram(
            formula_tiles(ids), _polys_df(spark, polys), CFG, n_bins=8
        ).collect()
    }
    exp = {}
    for tid in range(60):
        w, h = _FT_WS[tid % 3], _FT_HS[tid % 3]
        fmt = _FT_FMTS[(tid // 3) % 3]
        x0 = float((tid * 2654435761) % 90000) / 1000.0 + 2.0
        y0 = float((tid * 2246822519) % 90000) / 1000.0 + 2.0
        px = decode_image(encode_image(_formula_pixels(tid, w, h), fmt))
        xc = x0 + (np.arange(w) + 0.5) * ((w * 0.125) / w)
        yc = y0 + (np.arange(h) + 0.5) * ((h * 0.125) / h)
        X, Y = xc[None, :], yc[:, None]
        for pj, ring in enumerate(polys):
            v2 = np.roll(ring, -1, axis=0)
            mask = np.ones((h, w), dtype=bool)
            for (vx, vy), (ux, uy) in zip(ring, v2):
                mask &= (ux - vx) * (Y - vy) - (uy - vy) * (X - vx) >= 0
            vals = px[mask].ravel().astype(np.int64)
            for b, n in zip(*np.unique(vals * 8 // 256, return_counts=True)):
                key = (pj, int(b))
                exp[key] = exp.get(key, 0) + int(n)
    assert got == exp


def test_zonal_histogram_rejects_bad_bins(spark):
    import pytest as _pytest

    from python_prtree_spark.operators.raster import zonal_histogram

    with _pytest.raises(ValueError, match="n_bins"):
        zonal_histogram(
            formula_tiles(spark.range(0, 3)),
            _polys_df(spark, _convex_polys(2, 3)), CFG, n_bins=0,
        )
