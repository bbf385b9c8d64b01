"""Deterministic synthetic image+caption table (FIXTURES.md F1/F2) and the
reference's fixture recipes — generated distributed (mapInPandas over an id
range, so scale-out is a partition count, not a driver loop).

Schema per BASELINE.json input_hint:
  (image_id string, bytes binary, w int, h int, fmt string,
   caption string, phash bigint)
plus derived footprint boxes (xmin, ymin, xmax, ymax double) and a stable
numeric ``id`` for the spatial operators — the reference's fixture recipe
at /root/reference/tests/conftest.py:20-29 (uniform mins in [0,100),
extents >= 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from python_prtree_spark.functions.codec import decode_image, encode_image, phash64

_COLORS = ["red", "green", "blue", "amber", "violet", "teal", "coral", "slate"]
_NOUNS = ["fox", "door", "river", "tile", "crate", "lantern", "mosaic", "orchid"]

IMAGE_SCHEMA = (
    "id long, image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, xmin double, ymin double, xmax double, ymax double"
)

_WS = [16, 32, 64]
_HS = [16, 24, 48]


def gen_pixels(i: int, w: int, h: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed ^ i))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _boxes_for_range(lo: int, hi: int, seed: int = 42) -> np.ndarray:
    """Footprint boxes matching the reference fixture recipe, but computed
    per-id (counter-based) so any partition can generate its slice
    independently — mins in [0,100), extents in [1,101)."""
    n = hi - lo
    out = np.empty((n, 4))
    for j, i in enumerate(range(lo, hi)):
        r = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
        mins = r.random(2) * 100
        ext = r.random(2) * 100 + 1
        out[j] = [mins[0], mins[1], mins[0] + ext[0], mins[1] + ext[1]]
    return out


def _rows_for_range(lo: int, hi: int, seed: int, extent_scale: float) -> pd.DataFrame:
    boxes = _boxes_for_range(lo, hi, seed)
    if extent_scale != 1.0:
        boxes[:, 2] = boxes[:, 0] + (boxes[:, 2] - boxes[:, 0]) * extent_scale
        boxes[:, 3] = boxes[:, 1] + (boxes[:, 3] - boxes[:, 1]) * extent_scale
    rows = []
    for j, i in enumerate(range(lo, hi)):
        w, h = _WS[i % 3], _HS[i % 3]
        # every 10th lossy (PSNR-bounded), every (10k+4)th real PNG
        # (lossless, spec-compliant zlib codec), rest raw
        fmt = "lossy" if i % 10 == 9 else "png" if i % 10 == 4 else "raw"
        px = gen_pixels(i, w, h, seed)
        data = encode_image(px, fmt)
        color, noun = _COLORS[i % 8], _NOUNS[(i // 8) % 8]
        cap = f"caption of img{i:010d}: {color} {noun} at ({boxes[j,0]:.3f},{boxes[j,1]:.3f})"
        # phash of the *stored* image (decoded pixels), so the column is
        # recomputable from the bytes alone
        ph = phash64(decode_image(data))
        rows.append((i, f"img{i:010d}", data, w, h, fmt, cap, ph,
                     *boxes[j].tolist()))
    return pd.DataFrame(rows, columns=[
        "id", "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "xmin", "ymin", "xmax", "ymax",
    ])


def image_table(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    extent_scale: float = 1.0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation: each task renders its id slice."""
    parts = partitions or max(1, min(spark.sparkContext.defaultParallelism, n // 256 or 1))

    def gen(iterator):
        for pdf in iterator:
            for _, r in pdf.iterrows():
                yield _rows_for_range(int(r["lo"]), int(r["hi"]), seed, extent_scale)

    bounds = [(i * n // parts, (i + 1) * n // parts) for i in range(parts)]
    ranges = spark.createDataFrame(bounds, "lo long, hi long").repartition(parts, "lo")
    return ranges.mapInPandas(gen, schema=IMAGE_SCHEMA)


FORMULA_TILE_SCHEMA = (
    "image_id long, bytes binary, w int, h int, fmt string, "
    "xmin double, ymin double, xmax double, ymax double"
)

#: closed-form tile recipe (zonal-stats gate): every column below is a pure
#: function of the integer id, replicated verbatim by the DuckDB oracle in
#: __spark_entry__ — so the REAL codec path (encode here, decode inside
#: zonal_stats) is gated bit-for-bit by SQL. Keep the three lists and the
#: pixel formula in sync with FORMULA_TILE_SQL there.
_FT_WS = [16, 24, 32]
_FT_HS = [12, 16, 24]
_FT_FMTS = ["raw", "png", "lossy"]


def _formula_pixels(tid: int, w: int, h: int) -> np.ndarray:
    """pixel[r, c, ch] = (id*31 + r*7 + c*13 + ch*101) % 256 — exact in
    int64, trivially expressible in ANSI SQL."""
    r = np.arange(h, dtype=np.int64)[:, None, None] * 7
    c = np.arange(w, dtype=np.int64)[None, :, None] * 13
    ch = np.arange(3, dtype=np.int64)[None, None, :] * 101
    return ((tid * 31 + r + c + ch) % 256).astype(np.uint8)


def formula_tiles(ids_df: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic georeferenced raster tiles from an integer id column.

    Geometry is grid-exact by construction: extents are ``w*0.125`` /
    ``h*0.125`` (0.125 is a power of two, so the per-pixel step
    ``(xmax-xmin)/w`` reproduces to the same double in numpy and SQL), and
    the min corner is id-derived modular arithmetic in [2, 92) — the same
    family as the engine's other SQL-twinned fixtures. Formats cycle
    raw/png/lossy by ``(id//3) % 3``: raw and PNG decode exactly; lossy
    drops the value to even (``v - v%2``), which the oracle mirrors.
    Generation is mapInPandas over the id column — each task renders its
    slice, no driver loop."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for tid in pdf[id_col]:
                tid = int(tid)
                w, h = _FT_WS[tid % 3], _FT_HS[tid % 3]
                fmt = _FT_FMTS[(tid // 3) % 3]
                x0 = float((tid * 2654435761) % 90000) / 1000.0 + 2.0
                y0 = float((tid * 2246822519) % 90000) / 1000.0 + 2.0
                data = encode_image(_formula_pixels(tid, w, h), fmt)
                rows.append((tid, data, w, h, fmt,
                             x0, y0, x0 + w * 0.125, y0 + h * 0.125))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt",
                "xmin", "ymin", "xmax", "ymax",
            ])

    return ids_df.select(id_col).mapInPandas(gen, schema=FORMULA_TILE_SCHEMA)


def boxes_pdf(n: int, seed: int = 42, extent_scale: float = 1.0) -> np.ndarray:
    """Driver-side twin of the footprints (for numpy oracles in tests)."""
    b = _boxes_for_range(0, n, seed)
    if extent_scale != 1.0:
        b[:, 2] = b[:, 0] + (b[:, 2] - b[:, 0]) * extent_scale
        b[:, 3] = b[:, 1] + (b[:, 3] - b[:, 1]) * extent_scale
    return b
