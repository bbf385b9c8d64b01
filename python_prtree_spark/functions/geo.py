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
    "geohash_col",
    "hex_cell_cols",
    "lnglat_tile_cols",
    "tile_id_col",
    "quadkey_col",
    "quadkey_parent_col",
    "lnglat_tiles_np",
    "quadkey_np",
]

# sqrt(3) as one fixed double literal — Spark and any SQL oracle parse
# the identical value, so hex-center coordinates agree bit-for-bit
SQRT3 = 1.7320508075688772


def hex_cell_cols(
    x: Column, y: Column, size: float
) -> tuple[Column, Column]:
    """Pointy-top hexagonal binning: → (hq, hr) axial cell coordinates
    of the hexagon (circumradius ``size``) containing the point — i.e.
    the NEAREST hex center under Euclidean distance (the hexagons are
    the Voronoi cells of the center lattice).

    Center of axial (q, r): (size·√3·(q + r/2), size·1.5·r). Instead of
    the classic cube-rounding (whose float round() semantics differ
    across engines), the cell is chosen by exact argmin over the 3×3
    candidate window around the floored axial transform — a pure column
    expression: nine (dist², q, r) structs reduced by F.least (struct
    ordering = lexicographic, so equidistant boundary points tie-break
    to the smallest (q, r) — deterministic and oracle-reproducible).
    Zero shuffles; every arithmetic step is a fixed IEEE double
    sequence mirrored literally in the SQL twin."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    s = float(size)
    rf = F.floor(y / F.lit(1.5 * s)).cast("long")
    qf = F.floor(
        x / F.lit(SQRT3 * s) - rf.cast("double") / F.lit(2.0)
    ).cast("long")
    cands = []
    for dq in (-1, 0, 1):
        for dr in (-1, 0, 1):
            q = qf + F.lit(dq)
            r = rf + F.lit(dr)
            cx = F.lit(s * SQRT3) * (
                q.cast("double") + r.cast("double") / F.lit(2.0))
            cy = F.lit(s * 1.5) * r.cast("double")
            d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
            cands.append(F.struct(d2.alias("d"), q.alias("q"), r.alias("r")))
    best = F.least(*cands)
    return best["q"].alias("hq"), best["r"].alias("hr")

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


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_col(lng: Column, lat: Column, precision: int = 7) -> Column:
    """Standard base-32 geohash of ``precision`` characters — pure column
    expressions (bit interleave unrolled at plan-build time, whole-stage
    codegen; no UDF). Same pruning property as quadkeys: a geohash's
    prefix is its containing cell, so prefix equality = spatial
    containment and a prefix groupBy is a coarser spatial partitioner.

    Bit layout (geohash.org convention): bits alternate lon, lat, ...
    starting with longitude, MSB first; each 5-bit group maps to one
    character of "0123456789bcdefghjkmnpqrstuvwxyz"."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    ix = F.greatest(F.lit(0), F.least(
        F.lit((1 << lon_bits) - 1),
        F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))).cast("long"),
    ))
    iy = F.greatest(F.lit(0), F.least(
        F.lit((1 << lat_bits) - 1),
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))).cast("long"),
    ))
    chars = []
    for k in range(precision):
        digit = F.lit(0)
        for j in range(5):
            pos = 5 * k + j  # interleaved bit index, MSB-first
            if pos % 2 == 0:  # longitude bit
                shift = lon_bits - 1 - pos // 2
                bit = F.shiftrightunsigned(ix, shift).bitwiseAND(F.lit(1))
            else:             # latitude bit
                shift = lat_bits - 1 - pos // 2
                bit = F.shiftrightunsigned(iy, shift).bitwiseAND(F.lit(1))
            digit = digit * F.lit(2) + bit
        chars.append(F.lit(_GEOHASH32).substr(digit.cast("int") + F.lit(1), F.lit(1)))
    return F.concat(*chars)


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
