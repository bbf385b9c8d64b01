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

__all__ = ["idw_grid", "kriging_grid"]

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


def kriging_grid(
    points_df: DataFrame,
    radius: float,
    cfg: EngineConfig = DEFAULT_CONFIG,
    px: int = 16,
    nugget: float = 0.0,
    sill: float = 1.0,
    vrange: float = 10.0,
    max_samples: int = 64,
    x: str = "x",
    y: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """Ordinary kriging onto the tile/pixel lattice (gdal_grid
    "ordinary kriging" / gstat analogue) — the statistically-grounded
    sibling of ``idw_grid`` and the consumer of the engine's empirical
    ``variogram``: fit (nugget, sill, vrange) there, interpolate here.

    Semantics: per pixel center p, the BLUE estimate Σ w_i v_i where w
    solves the ordinary-kriging system [Γ 1; 1ᵀ 0][w; μ] = [γ(d_p); 1]
    with the spherical variogram γ(h) = nugget + (sill-nugget) ·
    (1.5 h/a - 0.5 (h/a)³) for h < a = vrange, else sill (γ(0) = 0).
    Weights sum to 1, so constant fields reproduce exactly and samples
    are honored at their own locations (nugget 0).

    Moving-neighborhood kriging: the support of pixel p is EXACTLY the
    samples with d(p, s) <= radius — the routed-halo plan (one shuffle,
    same as ``idw_grid``) guarantees every such sample reaches p's tile
    group, so the per-pixel support is complete and well-defined
    independent of tiling. The kernel groups pixels by identical
    support mask and runs one batched ``np.linalg.solve`` per distinct
    mask (pixels of one tile share few masks in practice). Determinism:
    exact duplicate sample coordinates are collapsed (value-averaged)
    before the solve (duplicates make Γ singular); groups larger than
    ``max_samples`` keep the lexicographically smallest (x, y, v)
    samples so the support is order-independent. NO SQL oracle — a
    dense linear solve is not expressible in ANSI SQL; the driver
    records rows-only and pytest pins the exactness invariants
    (constant-field reproduction, exact interpolation, agreement with a
    direct dense solve, 1-sample and symmetric-midpoint closed
    forms)."""
    import numpy as np
    import pandas as pd

    from python_prtree_spark.functions.tiling import explode_cells

    r = float(radius)
    if not (r > 0.0):
        raise ValueError(f"radius must be > 0, got {radius!r}")
    if not (vrange > 0.0):
        raise ValueError(f"vrange must be > 0, got {vrange!r}")

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
    ng, sl, a = float(nugget), float(sill), float(vrange)

    def gamma(h: "np.ndarray") -> "np.ndarray":
        import numpy as np

        hr = np.minimum(h / a, 1.0)
        g = ng + (sl - ng) * (1.5 * hr - 0.5 * hr**3)
        return np.where(h <= 0.0, 0.0, g)

    def paint(key, pdf):
        tile = int(key[0])
        ix, iy = tile // side, tile % side
        tx0 = cfg.extent.xmin + ix * cw
        ty0 = cfg.extent.ymin + iy * chh
        xc = tx0 + (np.arange(px) + 0.5) * (cw / px)
        yc = ty0 + (np.arange(px) + 0.5) * (chh / px)
        # collapse exact-duplicate coords (Γ would be singular)
        agg = (
            pdf.groupby(["_sx", "_sy"], as_index=False)["_sv"].mean()
            .sort_values(["_sx", "_sy", "_sv"])
        )
        if len(agg) > max_samples:
            agg = agg.iloc[:max_samples]
        sx = agg["_sx"].to_numpy()
        sy = agg["_sy"].to_numpy()
        sv = agg["_sv"].to_numpy()
        m = len(sx)
        if m == 0:
            return pd.DataFrame({
                "tile": np.array([], dtype=np.int64),
                "r": np.array([], dtype=np.int32),
                "c": np.array([], dtype=np.int32),
                "est": np.array([], dtype=np.float64),
                "n_used": np.array([], dtype=np.int32),
            })
        dxs = sx[:, None] - sx[None, :]
        dys = sy[:, None] - sy[None, :]
        gmat = gamma(np.sqrt(dxs * dxs + dys * dys))
        A = np.zeros((m + 1, m + 1))
        A[:m, :m] = gmat
        A[m, :m] = 1.0
        A[:m, m] = 1.0
        # pixel-center distances, (px*px, m); [r over y][c over x]
        gxx, gyy = np.meshgrid(xc, yc, indexing="xy")
        dpx = gxx.ravel()[:, None] - sx[None, :]
        dpy = gyy.ravel()[:, None] - sy[None, :]
        d2 = dpx * dpx + dpy * dpy
        in_range = d2 <= r2
        covered = in_range.any(axis=1)
        if not covered.any():
            return pd.DataFrame({
                "tile": np.array([], dtype=np.int64),
                "r": np.array([], dtype=np.int32),
                "c": np.array([], dtype=np.int32),
                "est": np.array([], dtype=np.float64),
                "n_used": np.array([], dtype=np.int32),
            })
        cmask = in_range[covered]                   # (P, m)
        cd2 = d2[covered]
        n_pix = cmask.shape[0]
        est = np.zeros(n_pix)
        n_used = cmask.sum(axis=1).astype(np.int32)
        uniq, inv = np.unique(cmask, axis=0, return_inverse=True)
        for u_idx in range(len(uniq)):
            mask = uniq[u_idx]
            sel = inv == u_idx
            mm = int(mask.sum())
            if mm == 1:
                est[sel] = sv[mask][0]
                continue
            Au = np.zeros((mm + 1, mm + 1))
            Au[:mm, :mm] = A[np.ix_(np.nonzero(mask)[0], np.nonzero(mask)[0])]
            Au[mm, :mm] = 1.0
            Au[:mm, mm] = 1.0
            B = np.ones((mm + 1, int(sel.sum())))
            B[:mm, :] = gamma(np.sqrt(cd2[np.ix_(sel, mask)].T))
            w = np.linalg.solve(Au, B)
            est[sel] = w[:mm, :].T @ sv[mask]
        idx = np.nonzero(covered)[0]
        rr, cc = np.divmod(idx, px)     # row = y index, col = x index
        return pd.DataFrame({
            "tile": np.full(len(idx), tile, dtype=np.int64),
            "r": rr.astype(np.int32),
            "c": cc.astype(np.int32),
            "est": est,
            "n_used": n_used,
        })

    return routed.groupBy("cell").applyInPandas(
        paint, schema="tile long, r int, c int, est double, n_used int"
    )
