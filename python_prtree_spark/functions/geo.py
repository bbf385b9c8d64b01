"""Geographic tiler: lng/lat → web-mercator tiles + hierarchical quadkeys.

The north-rule's global partitioner for EARTH-referenced data (the H3/S2
role), complementing the planar grid in functions/tiling.py: slippy-map
tile indices at a zoom level, Bing-style quadkey strings (one base-4 digit
per level — a tile's quadkey is a string PREFIX of all its descendants',
so prefix filters give hierarchical pruning on a plain string column), and
parent/child moves — all pure Spark column expressions (whole-stage
codegen; zero UDFs), with numpy twins for Arrow kernels.

Standard OSM/Bing tiling math (public spec):

    tx = floor((lng + 180) / 360 * 2^z)
    ty = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * 2^z)

both clamped to [0, 2^z - 1] (latitudes beyond ±85.0511 land in the edge
row, like the planar tiler clamps out-of-extent geometry). Tiles only
ROUTE rows — any exact predicate downstream is the arbiter of results —
so clamping is exact, matching the engine's contract that partitioning
never affects answers.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "lnglat_tile_cols",
    "tile_id_col",
    "quadkey_col",
    "quadkey_parent_col",
    "lnglat_tiles_np",
    "quadkey_np",
]

_MAX_ZOOM = 30  # tile ids stay < 2^60, safely inside a long


def _clamp(idx: Column, side: int) -> Column:
    return F.greatest(F.lit(0), F.least(F.lit(side - 1), idx)).cast("long")


def lnglat_tile_cols(lng: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """(tx, ty) slippy-map tile indices at ``zoom`` — JVM-side columns."""
    if not 0 <= zoom <= _MAX_ZOOM:
        raise ValueError(f"zoom must be in [0, {_MAX_ZOOM}], got {zoom}")
    n = float(1 << zoom)
    tx = F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    lat_r = F.radians(lat)
    # asinh(tan(lat)) written as ln(tan + sec): ln/tan/cos are the same
    # IEEE-double libm sequence DuckDB evaluates, keeping the oracle twin
    # bit-comparable (see __spark_entry__ geo_tile_assignment)
    merc = F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r))
    ty = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * F.lit(n))
    side = 1 << zoom
    return _clamp(tx, side), _clamp(ty, side)


def tile_id_col(tx: Column, ty: Column, zoom: int) -> Column:
    """Row-major long tile id (tx * 2^z + ty) — the shuffle/partition key."""
    return (tx * F.lit(1 << zoom) + ty).cast("long")


def quadkey_col(tx: Column, ty: Column, zoom: int) -> Column:
    """Bing-style quadkey string: digit per level, MSB first, each digit
    xbit + 2*ybit. Property used for pruning: parent quadkey = prefix."""
    if zoom == 0:
        return F.lit("")
    digits = []
    for level in range(zoom, 0, -1):
        s = level - 1
        xbit = F.shiftrightunsigned(tx, s).bitwiseAND(F.lit(1))
        ybit = F.shiftrightunsigned(ty, s).bitwiseAND(F.lit(1))
        digits.append((xbit + ybit * F.lit(2)).cast("string"))
    return F.concat(*digits)


def quadkey_parent_col(quadkey: Column, levels_up: int = 1) -> Column:
    """Ancestor quadkey: drop the last ``levels_up`` digits (string prefix
    = containing tile; empty string = the root tile)."""
    n = int(levels_up)
    if n < 0:
        raise ValueError("levels_up must be >= 0")
    return quadkey.substr(F.lit(1), F.greatest(F.length(quadkey) - n, F.lit(0)))


# ---------------------------------------------------------------------------
# numpy twins (inside Arrow kernels)
# ---------------------------------------------------------------------------

def lnglat_tiles_np(lng: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    side = 1 << zoom
    tx = np.floor((np.asarray(lng, np.float64) + 180.0) / 360.0 * side).astype(np.int64)
    lat_r = np.radians(np.asarray(lat, np.float64))
    merc = np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r))
    ty = np.floor((1.0 - merc / math.pi) / 2.0 * side).astype(np.int64)
    return np.clip(tx, 0, side - 1), np.clip(ty, 0, side - 1)


def quadkey_np(tx: np.ndarray, ty: np.ndarray, zoom: int) -> np.ndarray:
    tx = np.asarray(tx, np.int64)
    ty = np.asarray(ty, np.int64)
    out = np.full(len(tx), "", dtype=object)
    for level in range(zoom, 0, -1):
        s = level - 1
        digit = ((tx >> s) & 1) + 2 * ((ty >> s) & 1)
        out = np.char.add(out.astype(str), digit.astype(str)).astype(object)
    return out.astype(str)
