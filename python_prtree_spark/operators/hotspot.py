"""Spatial autocorrelation / hotspot statistics over sparse tiled rasters.

Getis-Ord Gi* (the ArcGIS "Hot Spot Analysis" statistic) and Anselin
local Moran's I (LISA cluster/outlier statistic) over the same sparse
(tile, r, c, cnt) pixel keying the rest of the raster suite uses
(rasterize_counts → focal_stats → polygonize chain). The study region is
the full side·px × side·px lattice; unlit cells are zeros, and the global
moments fold them in analytically (zeros add nothing to ΣX / ΣX², only to
n) — so the engine never materializes the dense lattice.

Reference parity note: the reference engine (atksh/python_prtree) has no
spatial-statistics surface; this belongs to the training-data /
geospatial-analytics extension family alongside idw_grid and slope_d8
(SURVEY.md §2.1b).

Scale shape (ONE skeleton shared by both statistics): each lit pixel
fans out to the 9 window positions in pure column arithmetic (bounded
9× of SPARSE input), ONE groupBy on the global pixel key combines
map-side — local_moran's center value rides that same groupBy as a
conditional sum over the (dx=0, dy=0) fan-out copy, no self-join — and
the two global moments arrive as a broadcast single-row crossJoin (no
driver collect). Statistics are emitted for every position whose 3×3
window contains at least one lit pixel (the one-pixel dilation of the
input — everywhere else each statistic is the constant background value
of an all-zero window).

Determinism: each score is a fixed sequence of IEEE-754 double ops
(+ - * / sqrt, all correctly rounded) over exactly-representable integer
inputs, evaluated in the same literal order by Spark and the DuckDB
oracle — bit-identical, so the quantized floor(score·1e6) gates are
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig


def _window_frame(
    pixels_df: DataFrame,
    cfg: EngineConfig,
    px: int,
    tile_col: str,
    value_col: str,
    with_center: bool,
):
    """Shared lattice skeleton: → (frame, w, side, grid, n_d) where
    frame has (gx, gy, fs[, xi], _sx, _sxx) — the 3×3 window sum per
    dilation position (plus the center value when ``with_center``) with
    the broadcast global moments attached — and ``w`` is the in-grid
    window-size column."""
    side = 1 << cfg.level
    grid = side * px
    n_d = float(grid) * float(grid)

    src = pixels_df.select(
        ((F.col(tile_col) / side).cast("long") * px + F.col("c")).alias("_gx"),
        ((F.col(tile_col) % side) * px + F.col("r")).alias("_gy"),
        F.col(value_col).cast("long").alias("_v"),
    )
    stats = src.agg(
        F.sum("_v").cast("double").alias("_sx"),
        F.sum(F.col("_v") * F.col("_v")).cast("double").alias("_sxx"),
    )
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    cols = [
        (F.col("_gx") + F.col("_o.dx")).alias("gx"),
        (F.col("_gy") + F.col("_o.dy")).alias("gy"),
        "_v",
    ]
    if with_center:
        # the (dx=0, dy=0) copy of each fan-out IS the center cell —
        # summing it conditionally recovers x_i in the same groupBy.
        cols.append(
            F.when((F.col("_o.dx") == 0) & (F.col("_o.dy") == 0), F.col("_v"))
            .otherwise(F.lit(0)).alias("_vc")
        )
    aggs = [F.sum("_v").alias("fs")]
    if with_center:
        aggs.append(F.sum("_vc").alias("xi"))
    fs = (
        src.select("_gx", "_gy", "_v", F.explode(offsets).alias("_o"))
        .select(*cols)
        .where(
            (F.col("gx") >= 0) & (F.col("gx") < grid)
            & (F.col("gy") >= 0) & (F.col("gy") < grid)
        )
        .groupBy("gx", "gy")
        .agg(*aggs)
    )
    wx = (
        F.least(F.col("gx") + 1, F.lit(grid - 1))
        - F.greatest(F.col("gx") - 1, F.lit(0)) + 1
    )
    wy = (
        F.least(F.col("gy") + 1, F.lit(grid - 1))
        - F.greatest(F.col("gy") - 1, F.lit(0)) + 1
    )
    w = (wx * wy).cast("int")
    frame = fs.crossJoin(F.broadcast(stats)).withColumn("w", w)
    return frame, side, grid, n_d


def _emit(frame, side: int, px: int, extra_cols):
    """Shared output projection back onto the (tile, r, c) keying."""
    return frame.select(
        ((F.col("gx") / px).cast("long") * side
         + (F.col("gy") / px).cast("long")).alias("tile"),
        (F.col("gy") % px).cast("int").alias("r"),
        (F.col("gx") % px).cast("int").alias("c"),
        "w",
        *extra_cols,
    )


def local_moran(
    pixels_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    px: int = 16,
    tile_col: str = "tile",
    value_col: str = "cnt",
) -> DataFrame:
    """Anselin local Moran's I (LISA cluster/outlier statistic), queen
    contiguity (8 neighbors, self EXCLUDED), binary weights, over the
    full lattice implied by ``cfg.level`` / px — the companion statistic
    to :func:`gi_star` (Gi* finds hot/cold clusters; I_i additionally
    flags spatial OUTLIERS: high cells in low neighborhoods and vice
    versa).

    For cell i with value x_i, in-grid 3×3 window size W_i, window sum
    S_i (incl. self), global n = (side·px)², x̄ = ΣX/n and population
    variance s² = ΣX²/n − x̄²; the neighbor deviation sum needs no second
    pass because Σ_{j∈N(i)} (x_j − x̄) = (S_i − x_i) − x̄·(W_i − 1):

        I_i = ((x_i − x̄) / s²) · ((S_i − x_i) − x̄·(W_i − 1))

    → (tile, r, c, w, xi, fs, moran_q) with moran_q = floor(I_i·1e6),
    bit-exact vs the SQL oracle (identical IEEE double op order).
    """
    frame, side, _grid, n_d = _window_frame(
        pixels_df, cfg, px, tile_col, value_col, with_center=True)
    # mirrored VERBATIM by the oracle SQL (same IEEE double op order).
    n_lit = F.lit(n_d)
    mean = F.col("_sx") / n_lit
    var = F.col("_sxx") / n_lit - mean * mean
    xi_d = F.col("xi").cast("double")
    lag = (F.col("fs").cast("double") - xi_d) - mean * (
        F.col("w").cast("double") - F.lit(1.0)
    )
    moran = ((xi_d - mean) / var) * lag
    return _emit(frame, side, px, [
        F.col("xi").cast("long").alias("xi"),
        F.col("fs").cast("long").alias("fs"),
        F.floor(moran * F.lit(1e6)).cast("long").alias("moran_q"),
    ])


def gi_star(
    pixels_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    px: int = 16,
    tile_col: str = "tile",
    value_col: str = "cnt",
) -> DataFrame:
    """Getis-Ord Gi* hotspot z-scores, 3×3 Moore window including self,
    binary weights, over the full lattice implied by ``cfg.level`` / px.

    For cell i with in-grid window size W_i (9 in the interior, clipped
    at edges/corners), window sum S_i = Σ_{j ∈ win(i)} x_j, global
    n = (side·px)², mean x̄ = ΣX/n and s = sqrt(ΣX²/n − x̄²):

        Gi* = (S_i − x̄·W_i) / (s · sqrt((n·W_i − W_i²) / (n − 1)))

    → (tile, r, c, w, fs, gi_q): the exact integer window size and
    window sum, plus the z-score quantized to floor(z·1e6) (long).
    Positive gi_q ≫ 0 = statistically hot cluster, ≪ 0 = cold.
    """
    frame, side, _grid, n_d = _window_frame(
        pixels_df, cfg, px, tile_col, value_col, with_center=False)
    # mirrored VERBATIM by the oracle SQL (same IEEE double op order).
    n_lit = F.lit(n_d)
    mean = F.col("_sx") / n_lit
    s = F.sqrt(F.col("_sxx") / n_lit - mean * mean)
    w_d = F.col("w").cast("double")
    z = (F.col("fs").cast("double") - mean * w_d) / (
        s * F.sqrt((n_lit * w_d - w_d * w_d) / F.lit(n_d - 1.0))
    )
    return _emit(frame, side, px, [
        F.col("fs").cast("long").alias("fs"),
        F.floor(z * F.lit(1e6)).cast("long").alias("gi_q"),
    ])
