"""rasterize_counts / rasterize_tiles (vector→raster paint) vs numpy
brute force: per-pixel covering-box counts over the full tile lattice,
closed pixel-center predicate, PNG tile decode-roundtrip."""

from __future__ import annotations

import numpy as np

from python_prtree_spark import EngineConfig, Extent
from python_prtree_spark.functions.codec import decode_png
from python_prtree_spark.operators.raster import rasterize_counts, rasterize_tiles
from tests.conftest import boxes_df, rand_boxes

CFG = EngineConfig(extent=Extent(0, 0, 100, 100), level=3)
PX = 8


def _counts_oracle(boxes, cfg, px):
    """{(tile, r, c): cnt} for every pixel center covered by >= 1 box."""
    side = 1 << cfg.level
    cw = cfg.extent.width() / side
    chh = cfg.extent.height() / side
    b = np.asarray(boxes, dtype=float)
    out = {}
    for t in range(side * side):
        ix, iy = t // side, t % side
        xc = cfg.extent.xmin + ix * cw + (np.arange(px) + 0.5) * (cw / px)
        yc = cfg.extent.ymin + iy * chh + (np.arange(px) + 0.5) * (chh / px)
        X, Y = xc[None, None, :], yc[None, :, None]
        m = (
            (b[:, 0, None, None] <= X) & (X <= b[:, 2, None, None])
            & (b[:, 1, None, None] <= Y) & (Y <= b[:, 3, None, None])
        )
        cnt = m.sum(axis=0)
        for r, c in zip(*np.nonzero(cnt)):
            out[(t, int(r), int(c))] = int(cnt[r, c])
    return out


def test_rasterize_counts_oracle(spark):
    boxes = rand_boxes(200, 17, ext_max=12.0)
    got = {
        (row["tile"], row["r"], row["c"]): row["cnt"]
        for row in rasterize_counts(boxes_df(spark, boxes), CFG, px=PX).collect()
    }
    assert got == _counts_oracle(boxes, CFG, PX)


def test_rasterize_center_on_box_edge_counts(spark):
    """A box whose edge passes exactly through a pixel center covers it
    (closed predicate). Tile 0 pixel (0,0) center is (0.78125, 0.78125)
    at level 3 / px 8 over [0,100]²: a box with xmin exactly there
    still counts the pixel."""
    cx = 0.0 + 0 * (100.0 / 8) + (0 + 0.5) * ((100.0 / 8) / 8)  # 0.78125
    boxes = np.array([[cx, cx, 5.0, 5.0]])
    got = {
        (row["tile"], row["r"], row["c"]): row["cnt"]
        for row in rasterize_counts(boxes_df(spark, boxes), CFG, px=PX).collect()
    }
    assert got[(0, 0, 0)] == 1
    assert got == _counts_oracle(boxes, CFG, PX)


def test_rasterize_tiles_png_roundtrip(spark):
    """Each emitted tile PNG decodes (engine PNG codec) to exactly
    min(count, 255) in every channel; tiles agree with rasterize_counts."""
    boxes = rand_boxes(150, 23, ext_max=10.0)
    counts = _counts_oracle(boxes, CFG, PX)
    rows = rasterize_tiles(boxes_df(spark, boxes), CFG, px=PX).collect()
    seen_nonzero = set()
    for row in rows:
        assert (row["w"], row["h"]) == (PX, PX)
        img = decode_png(bytes(row["png"]))
        assert img.shape == (PX, PX, 3)
        assert (img[:, :, 0] == img[:, :, 1]).all() and (img[:, :, 1] == img[:, :, 2]).all()
        for r in range(PX):
            for c in range(PX):
                exp = min(counts.get((row["tile"], r, c), 0), 255)
                assert int(img[r, c, 0]) == exp
        if img.any():
            seen_nonzero.add(row["tile"])
    assert seen_nonzero == {t for (t, _, _) in counts}


def _pyramid_oracle(boxes, cfg, px):
    """{(ptile, r, c): v} — child value min(cnt,255), parent = floor-mean
    of each 2x2 block on the stitched global plane; rows only for v>0."""
    side = 1 << cfg.level
    G = np.zeros((side * px, side * px), dtype=np.int64)  # [gy, gx]
    for (t, r, c), cnt in _counts_oracle(boxes, cfg, px).items():
        ix, iy = t // side, t % side
        G[iy * px + r, ix * px + c] = min(cnt, 255)
    P = (G[0::2, 0::2] + G[1::2, 0::2] + G[0::2, 1::2] + G[1::2, 1::2]) // 4
    side_p = side // 2
    out = {}
    for gy, gx in zip(*np.nonzero(P)):
        ptile = (gx // px) * side_p + (gy // px)
        out[(int(ptile), int(gy % px), int(gx % px))] = int(P[gy, gx])
    return out


def test_pyramid_values_oracle(spark):
    """rasterize_tiles → pyramid_level_values chain: real PNG encode THEN
    decode inside the pipeline, checked against the counts oracle."""
    from python_prtree_spark.operators.raster import pyramid_level_values

    boxes = rand_boxes(200, 29, ext_max=15.0)
    tiles = rasterize_tiles(boxes_df(spark, boxes), CFG, px=PX)
    got = {
        (row["tile"], row["r"], row["c"]): row["v"]
        for row in pyramid_level_values(tiles, level=CFG.level, px=PX).collect()
    }
    assert got == _pyramid_oracle(boxes, CFG, PX)


def test_pyramid_png_matches_values(spark):
    """The PNG form decodes to exactly the values form (and zero
    elsewhere), tile for tile."""
    from python_prtree_spark.operators.raster import pyramid_level

    boxes = rand_boxes(120, 31, ext_max=15.0)
    tiles = rasterize_tiles(boxes_df(spark, boxes), CFG, px=PX)
    vals = _pyramid_oracle(boxes, CFG, PX)
    rows = pyramid_level(tiles, level=CFG.level, px=PX).collect()
    for row in rows:
        img = decode_png(bytes(row["png"]))
        for r in range(PX):
            for c in range(PX):
                assert int(img[r, c, 0]) == vals.get((row["tile"], r, c), 0)
    assert {t for (t, _, _) in vals} <= {row["tile"] for row in rows}


def test_pyramid_two_levels(spark):
    """pyramid_level composes: level 3 → 2 → 1 tiles agree with
    downsampling the global plane twice (id remapping at every level)."""
    from python_prtree_spark.operators.raster import pyramid_level

    boxes = rand_boxes(150, 37, ext_max=18.0)
    side = 1 << CFG.level
    G = np.zeros((side * PX, side * PX), dtype=np.int64)
    for (t, r, c), cnt in _counts_oracle(boxes, CFG, PX).items():
        G[(t % side) * PX + r, (t // side) * PX + c] = min(cnt, 255)
    for _ in range(2):
        G = (G[0::2, 0::2] + G[1::2, 0::2] + G[0::2, 1::2] + G[1::2, 1::2]) // 4
    lvl1 = pyramid_level(
        pyramid_level(rasterize_tiles(boxes_df(spark, boxes), CFG, px=PX),
                      level=CFG.level, px=PX),
        level=CFG.level - 1, px=PX,
    ).collect()
    side1 = 1 << (CFG.level - 2)
    for row in lvl1:
        img = decode_png(bytes(row["png"]))
        ix, iy = row["tile"] // side1, row["tile"] % side1
        exp = G[iy * PX:(iy + 1) * PX, ix * PX:(ix + 1) * PX]
        assert (img[:, :, 0] == exp).all()


def test_pyramid_level_zero_rejected(spark):
    import pytest as _pytest

    from python_prtree_spark.operators.raster import pyramid_level

    tiles = rasterize_tiles(boxes_df(spark, rand_boxes(5, 3)), CFG, px=PX)
    with _pytest.raises(ValueError, match="level >= 1"):
        pyramid_level(tiles, level=0, px=PX)


def test_raster_algebra_ops_and_missing_as_zero(spark):
    import pytest as _pytest

    from python_prtree_spark.operators.raster import raster_algebra

    def df(rows):
        return spark.createDataFrame(
            [(int(t), int(r), int(c), int(v)) for t, r, c, v in rows],
            "tile long, r int, c int, cnt long",
        )

    a = df([(0, 0, 0, 5), (0, 0, 1, 2), (1, 3, 3, 7)])
    b = df([(0, 0, 0, 3), (0, 1, 0, 4), (1, 3, 3, 7)])
    key = lambda rows: {(r["tile"], r["r"], r["c"]): r["v"] for r in rows}
    assert key(raster_algebra(a, b, "subtract").collect()) == {
        (0, 0, 0): 2, (0, 0, 1): 2, (0, 1, 0): -4,
    }
    assert key(raster_algebra(a, b, "add").collect()) == {
        (0, 0, 0): 8, (0, 0, 1): 2, (0, 1, 0): 4, (1, 3, 3): 14,
    }
    assert key(raster_algebra(a, b, "multiply").collect()) == {
        (0, 0, 0): 15, (1, 3, 3): 49,
    }
    assert key(raster_algebra(a, b, "min").collect()) == {(0, 0, 0): 3, (1, 3, 3): 7}
    # keep_zero retains the aligned-but-cancelled pixel
    full = key(raster_algebra(a, b, "subtract", keep_zero=True).collect())
    assert full[(1, 3, 3)] == 0 and len(full) == 4
    with _pytest.raises(ValueError, match="op must be one of"):
        raster_algebra(a, b, "divide")


def test_focal_stats_vs_numpy_conv(spark):
    import pytest as _pytest

    from python_prtree_spark.operators.raster import focal_stats

    rng = np.random.default_rng(51)
    rows = set()
    for _ in range(300):
        rows.add((int(rng.integers(0, 64)), int(rng.integers(0, PX)),
                  int(rng.integers(0, PX))))
    rows = [(t, r, c, int((t + r + c) % 7) + 1) for t, r, c in rows]
    df = spark.createDataFrame(rows, "tile long, r int, c int, cnt long")
    side = 8
    grid = side * PX
    dense = np.zeros((grid, grid), dtype=np.int64)    # [gx, gy]
    lit = np.zeros((grid, grid), dtype=bool)
    for t, r, c, v in rows:
        gx, gy = (t // side) * PX + c, (t % side) * PX + r
        dense[gx, gy] = v
        lit[gx, gy] = True

    def brute(op):
        out = {}
        for gx in range(grid):
            for gy in range(grid):
                vals = [
                    dense[x, y]
                    for x in range(max(0, gx - 1), min(grid, gx + 2))
                    for y in range(max(0, gy - 1), min(grid, gy + 2))
                    if lit[x, y]
                ]
                if not vals:
                    continue
                v = {"sum": sum(vals), "max": max(vals), "count": len(vals)}[op]
                t = (gx // PX) * side + (gy // PX)
                out[(t, gy % PX, gx % PX)] = v
        return out

    for op in ("sum", "max", "count"):
        got = {
            (r2["tile"], r2["r"], r2["c"]): r2["v"]
            for r2 in focal_stats(df, CFG, px=PX, op=op).collect()
        }
        assert got == brute(op), op
    with _pytest.raises(ValueError, match="op must be one of"):
        focal_stats(df, CFG, px=PX, op="median")


def test_raster_convolve_vs_numpy(spark):
    import pytest as _pytest

    from python_prtree_spark.operators.raster import raster_convolve

    rng = np.random.default_rng(57)
    rows = set()
    for _ in range(250):
        rows.add((int(rng.integers(0, 64)), int(rng.integers(0, PX)),
                  int(rng.integers(0, PX))))
    rows = [(t, r, c, int((t * 3 + r + c) % 9) + 1) for t, r, c in rows]
    df = spark.createDataFrame(rows, "tile long, r int, c int, cnt long")
    side = 8
    grid = side * PX
    dense = np.zeros((grid, grid), dtype=np.int64)  # [gy, gx]
    for t, r, c, v in rows:
        dense[(t % side) * PX + r, (t // side) * PX + c] = v

    kernels = [
        [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],   # sobel-x
        [[0, 1, 0], [1, -4, 1], [0, 1, 0]],     # laplacian (cross: 5 taps)
    ]
    for k in kernels:
        exp = {}
        for gy in range(grid):
            for gx in range(grid):
                v = sum(
                    k[dy + 1][dx + 1] * dense[gy + dy, gx + dx]
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= gy + dy < grid and 0 <= gx + dx < grid
                )
                if v != 0:
                    t = (gx // PX) * side + (gy // PX)
                    exp[(t, gy % PX, gx % PX)] = v
        got = {
            (r2["tile"], r2["r"], r2["c"]): r2["v"]
            for r2 in raster_convolve(df, k, CFG, px=PX).collect()
        }
        assert got == exp, k
    with _pytest.raises(ValueError, match="odd-N x N"):
        raster_convolve(df, [[1, 2], [3, 4]], CFG, px=PX)
    with _pytest.raises(ValueError, match="all zeros"):
        raster_convolve(df, [[0] * 3] * 3, CFG, px=PX)
