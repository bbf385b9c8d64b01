"""Inverse-distance-weighted grid interpolation (gdal_grid / QGIS "IDW"
analogue) — north-rule extension: estimate a continuous surface on the
engine's tile/pixel lattice from scattered sample points.

Semantics: for pixel center p and every sample s with planar distance
d(p, s) <= radius, accumulate the regularized inverse-distance weight
w = 1 / (1 + d²) — the +1 removes the singularity at d = 0 with no
epsilon tuning — and estimate value(p) = Σ w·v / Σ w.

Exactness across engines: floats summed in shuffle order are not
reproducible, so each term is quantized to fixed point FIRST —
num = floor(v · 1e6 / (1 + d²)), den = floor(1e6 / (1 + d²)) — and the
kernel sums int64. The output is (tile, r, c, num_q, den_q): integer
sums any SQL engine reproduces bit-for-bit regardless of order (the
final ratio is one double division away, left to the caller so the
gate stays integer-exact).

Distributed plan — the rasterize_counts shape with a halo:

  1. every sample expands to the box [p ± radius] and routes to the
     tiles that box covers (explode_cells — bounded duplication: a
     sample lands on the few tiles whose pixels could be in range, never
     broadcast). The box certificate: any pixel center within ``radius``
     of s lies in a tile intersecting the box, so per-tile groups are
     COMPLETE — no cross-tile combine stage is needed at all.
  2. ONE shuffle groups samples per tile; an Arrow kernel builds the
     pixel-center lattice and accumulates both fixed-point sums with a
     vectorized outer distance computation, chunked over samples so slab
     memory stays constant regardless of how many samples hit one tile.
  3. sparse output: only pixels with den_q > 0 (i.e. >= 1 in-range
     sample) emit rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig

__all__ = ["idw_grid"]

_CHUNK = 4096  # samples per BLAS slab inside the kernel


def idw_grid(
    points_df: DataFrame,
    radius: float,
    cfg: EngineConfig = DEFAULT_CONFIG,
    px: int = 16,
    x: str = "x",
    y: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """points_df: (x, y, value_col) samples. → (tile, r, c, num_q, den_q)
    for every pixel with at least one sample within ``radius`` (closed
    predicate d² <= radius²); num_q/den_q are the exact int64 sums of the
    per-sample fixed-point IDW terms. Estimate = num_q / den_q."""
    import numpy as np
    import pandas as pd

    from python_prtree_spark.functions.tiling import explode_cells

    r = float(radius)
    if not (r > 0.0):  # also rejects NaN
        raise ValueError(f"radius must be > 0, got {radius!r}")

    routed = explode_cells(
        points_df.select(
            F.col(x).alias("_sx"), F.col(y).alias("_sy"),
            F.col(value_col).cast("double").alias("_sv"),
            (F.col(x) - r).alias("xmin"), (F.col(y) - r).alias("ymin"),
            (F.col(x) + r).alias("xmax"), (F.col(y) + r).alias("ymax"),
        ),
        cfg.extent, cfg.level,
    )
    side = 1 << cfg.level
    cw = cfg.extent.width() / side
    chh = cfg.extent.height() / side
    r2 = r * r

    def paint(key, pdf):
        tile = int(key[0])
        ix, iy = tile // side, tile % side
        tx0 = cfg.extent.xmin + ix * cw
        ty0 = cfg.extent.ymin + iy * chh
        # identical lattice expression to rasterize_counts / the oracle
        xc = tx0 + (np.arange(px) + 0.5) * (cw / px)
        yc = ty0 + (np.arange(px) + 0.5) * (chh / px)
        num = np.zeros((px, px), dtype=np.int64)
        den = np.zeros((px, px), dtype=np.int64)
        sx = pdf["_sx"].to_numpy()
        sy = pdf["_sy"].to_numpy()
        sv = pdf["_sv"].to_numpy()
        for lo in range(0, len(sx), _CHUNK):
            bx, by, bv = sx[lo:lo + _CHUNK], sy[lo:lo + _CHUNK], sv[lo:lo + _CHUNK]
            dx = xc[None, :, None] - bx[None, None, :]      # (1, px, m)
            dy = yc[:, None, None] - by[None, None, :]      # (px, 1, m)
            d2 = dx * dx + dy * dy                          # (px, px, m)
            inr = d2 <= r2
            w = 1.0 + d2
            num += np.where(inr, np.floor(bv[None, None, :] * 1e6 / w), 0.0) \
                .astype(np.int64).sum(axis=2)
            den += np.where(inr, np.floor(1e6 / w), 0.0) \
                .astype(np.int64).sum(axis=2)
        rr, cc = np.nonzero(den)
        return pd.DataFrame({
            "tile": np.full(len(rr), tile, dtype=np.int64),
            "r": rr.astype(np.int32), "c": cc.astype(np.int32),
            "num_q": num[rr, cc], "den_q": den[rr, cc],
        })

    return routed.groupBy("cell").applyInPandas(
        paint, schema="tile long, r int, c int, num_q long, den_q long"
    )
