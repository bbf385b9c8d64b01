"""Geographic tiler (functions/geo.py): slippy tiles, quadkeys, hierarchy.

Anchors use the public OSM tiling convention (e.g. lng=0, lat=0 at zoom 1
is tile (1, 0)..(1,1) boundary → (1, 1) upper half? no: y=0.5 → ty=1? see
per-case comments); the Spark columns, the numpy twins, and a pure-python
reference implementation must all agree on random points.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_prtree_spark.functions.geo import (
    lnglat_tile_cols,
    lnglat_tiles_np,
    quadkey_col,
    quadkey_np,
    quadkey_parent_col,
    tile_id_col,
)


def _ref_tile(lng: float, lat: float, zoom: int) -> tuple[int, int]:
    """Textbook scalar slippy-map formula (independent of the impl)."""
    n = 1 << zoom
    tx = int(math.floor((lng + 180.0) / 360.0 * n))
    lat_r = math.radians(lat)
    ty = int(math.floor(
        (1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n
    ))
    return max(0, min(n - 1, tx)), max(0, min(n - 1, ty))


def _pts(n=400, seed=5):
    rng = np.random.default_rng(seed)
    lng = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-85.0, 85.0, n)
    return lng, lat


@pytest.mark.parametrize("zoom", [1, 6, 12])
def test_tiles_match_reference_formula(spark, zoom):
    lng, lat = _pts()
    tx_np, ty_np = lnglat_tiles_np(lng, lat, zoom)
    for i in range(len(lng)):
        assert (tx_np[i], ty_np[i]) == _ref_tile(lng[i], lat[i], zoom)

    import pandas as pd
    df = spark.createDataFrame(
        pd.DataFrame({"i": np.arange(len(lng)), "lng": lng, "lat": lat}),
        schema="i long, lng double, lat double",
    )
    tx, ty = lnglat_tile_cols(F.col("lng"), F.col("lat"), zoom)
    rows = df.select("i", tx.alias("tx"), ty.alias("ty"),
                     tile_id_col(tx, ty, zoom).alias("tid"),
                     quadkey_col(tx, ty, zoom).alias("qk")).collect()
    qk_np = quadkey_np(tx_np, ty_np, zoom)
    for r in rows:
        i = r["i"]
        assert (r["tx"], r["ty"]) == (tx_np[i], ty_np[i])
        assert r["tid"] == tx_np[i] * (1 << zoom) + ty_np[i]
        assert r["qk"] == qk_np[i]
        assert len(r["qk"]) == zoom


def test_polar_clamping():
    """Latitudes beyond the mercator singularity land in the edge rows."""
    tx, ty = lnglat_tiles_np(np.array([0.0, 0.0]), np.array([89.9, -89.9]), 4)
    assert ty[0] == 0 and ty[1] == 15
    tx, _ = lnglat_tiles_np(np.array([-180.0, 179.999]), np.array([0.0, 0.0]), 4)
    assert tx[0] == 0 and tx[1] == 15


def test_quadkey_hierarchy(spark):
    """Parent quadkey is a strict prefix; children share it."""
    lng, lat = _pts(100, seed=9)
    tx, ty = lnglat_tiles_np(lng, lat, 10)
    qk10 = quadkey_np(tx, ty, 10)
    qk7 = quadkey_np(tx >> 3, ty >> 3, 7)
    assert all(k10.startswith(k7) for k10, k7 in zip(qk10, qk7))

    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"qk": qk10}), schema="qk string")
    got = df.select(quadkey_parent_col(F.col("qk"), 3).alias("p")).collect()
    assert [r["p"] for r in got] == list(qk7)


def test_known_anchor_tiles():
    """Public anchor: (lng 13.4050, lat 52.5200) Berlin @ z=10 → (550, 335)
    — standard OSM tile calculator value."""
    tx, ty = lnglat_tiles_np(np.array([13.4050]), np.array([52.5200]), 10)
    assert (tx[0], ty[0]) == (550, 335)
    # Null Island @ z=1 → tile (1, 1) boundary: x=0.5→tx 1, y=0.5→ty 1
    tx, ty = lnglat_tiles_np(np.array([0.0]), np.array([0.0]), 1)
    assert (tx[0], ty[0]) == (1, 1)


def _geohash_ref(lng: float, lat: float, precision: int) -> str:
    """Independent reference: the classic interval-bisection algorithm
    (geohash.org), no shared code with the column implementation."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo = [-180.0, -90.0]
    hi = [180.0, 90.0]
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        d = 0 if even else 1
        mid = (lo[d] + hi[d]) / 2
        v = lng if even else lat
        if v >= mid:
            ch = ch * 2 + 1
            lo[d] = mid
        else:
            ch = ch * 2
            hi[d] = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(b32[ch])
            bit, ch = 0, 0
    return "".join(out)


def test_geohash_known_value(spark):
    from python_prtree_spark.functions.geo import geohash_col

    df = spark.createDataFrame(
        [(1, -5.603, 42.605)], "pid long, lng double, lat double"
    )
    got = df.select(geohash_col(F.col("lng"), F.col("lat"), 5).alias("g")).first()["g"]
    assert got == "ezs42"  # canonical geohash.org example


def test_geohash_vs_bisection_reference(spark):
    import numpy as np

    from python_prtree_spark.functions.geo import geohash_col

    rng = np.random.default_rng(42)
    lngs = rng.uniform(-179.9, 179.9, 300)
    lats = rng.uniform(-84.9, 84.9, 300)
    df = spark.createDataFrame(
        [(i, float(lngs[i]), float(lats[i])) for i in range(300)],
        "pid long, lng double, lat double",
    )
    for prec in (1, 5, 7, 12):
        got = {
            r["pid"]: r["g"]
            for r in df.select(
                "pid", geohash_col(F.col("lng"), F.col("lat"), prec).alias("g")
            ).collect()
        }
        for i in range(300):
            assert got[i] == _geohash_ref(lngs[i], lats[i], prec), (i, prec)
    # prefix property: precision-5 hash is a prefix of precision-12
    g5 = {r["pid"]: r["g"] for r in df.select(
        "pid", geohash_col(F.col("lng"), F.col("lat"), 5).alias("g")).collect()}
    g12 = {r["pid"]: r["g"] for r in df.select(
        "pid", geohash_col(F.col("lng"), F.col("lat"), 12).alias("g")).collect()}
    assert all(g12[i].startswith(g5[i]) for i in range(300))


def _hex_brute(x, y, s):
    """Nearest pointy-top hex center (circumradius s), (d2, q, r) order."""
    from python_prtree_spark.functions.geo import SQRT3

    r0 = int(math.floor(y / (1.5 * s)))
    q0 = int(math.floor(x / (SQRT3 * s) - r0 / 2))
    best = None
    for q in range(q0 - 3, q0 + 4):
        for r in range(r0 - 3, r0 + 4):
            cx, cy = s * SQRT3 * (q + r / 2.0), s * 1.5 * r
            key = ((x - cx) ** 2 + (y - cy) ** 2, q, r)
            if best is None or key < best:
                best = key
    return best[1], best[2]


@pytest.mark.parametrize("size", [1.0, 7.0])
def test_hex_cells_match_nearest_center(spark, size):
    import pandas as pd

    from python_prtree_spark.functions.geo import hex_cell_cols

    rng = np.random.default_rng(23)
    pdf = pd.DataFrame({
        "x": rng.uniform(-50, 50, 500), "y": rng.uniform(-50, 50, 500)})
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), size)
    got = spark.createDataFrame(pdf).select("x", "y", hq, hr).collect()
    for r in got:
        assert (r["hq"], r["hr"]) == _hex_brute(r["x"], r["y"], size), r


def test_hex_cells_boundary_ties_lexicographic(spark):
    """Exact midpoints between two centers tie on distance; the struct
    least picks the smaller (q, r) — same rule as the SQL twin."""
    import pandas as pd

    from python_prtree_spark.functions.geo import SQRT3, hex_cell_cols

    s = 4.0
    pts = [(s * SQRT3 * 0.5, 0.0), (s * SQRT3, 0.75 * s), (0.0, 0.75 * s)]
    pdf = pd.DataFrame(pts, columns=["x", "y"])
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), s)
    got = spark.createDataFrame(pdf).select("x", "y", hq, hr).collect()
    for r in got:
        assert (r["hq"], r["hr"]) == _hex_brute(r["x"], r["y"], s), r


def test_hex_cells_pure_projection_plan(spark):
    import pandas as pd

    from python_prtree_spark.functions.geo import hex_cell_cols
    from python_prtree_spark.plans import explain_str

    df = spark.createDataFrame(
        pd.DataFrame({"x": [0.0], "y": [0.0]}))
    plan = explain_str(df.select(*hex_cell_cols(F.col("x"), F.col("y"), 2.0)))
    assert "Exchange" not in plan and "pythonUDF" not in plan, plan


def test_hex_cells_rejects_bad_size():
    from python_prtree_spark.functions.geo import hex_cell_cols

    with pytest.raises(ValueError):
        hex_cell_cols(F.lit(0.0), F.lit(0.0), 0.0)
