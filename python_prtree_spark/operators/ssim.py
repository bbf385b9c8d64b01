"""SSIM — structural similarity (Wang et al., IEEE TIP 2004) between two
aligned image layers, the standard perceptual quality metric an image
training pipeline runs after every lossy re-encode / resize / augment
to verify the asset survived (the PSNR gate's stricter sibling).

Inputs are aligned sparse pixel frames (img, px, py, v) — the engine's
mosaic representation; the score is per image/tile over the pixels
PRESENT IN BOTH layers (an inner pixel join; resolution mismatches are
the caller's resample step).

Exactness pattern: SSIM's closed form overflows int64 when cleared of
denominators (products reach ~1e27), so the HASH-GATED output is the
exact int64 sufficient-statistic vector per image —

    n, Sx, Sy, Sxx, Syy, Sxy

(one co-partitioned pixel join + one map-side-combined groupBy, pure
JVM) — and ``ssim`` is derived from those six integers by ONE documented
float64 expression (identical on any engine):

    mx = Sx/n, my = Sy/n
    vx = Sxx/n - mx², vy = Syy/n - my², cxy = Sxy/n - mx·my
    SSIM = (2·mx·my + C1)(2·cxy + C2) / ((mx²+my²+C1)(vx+vy+C2))

with the standard constants C1 = (0.01·L)², C2 = (0.03·L)² for dynamic
range L (255). Population (not sample) moments, global (not sliding
window) — the per-window variant is the same operator grouped by
(img, px//w, py//w).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ssim_stats"]


def ssim_stats(
    a: DataFrame,
    b: DataFrame,
    dynamic_range: int = 255,
    img_col: str = "img",
) -> DataFrame:
    """-> one row per image: (img, n, sx, sy, sxx, syy, sxy, ssim).
    ``a``/``b``: (img, px, py, v) integer-pixel frames; score over the
    common pixel set; images with no common pixels emit nothing."""
    left = a.select(
        F.col(img_col).cast("long").alias("img"),
        F.col("px").cast("long").alias("px"),
        F.col("py").cast("long").alias("py"),
        F.col("v").cast("long").alias("_x"),
    )
    right = b.select(
        F.col(img_col).cast("long").alias("img"),
        F.col("px").cast("long").alias("px"),
        F.col("py").cast("long").alias("py"),
        F.col("v").cast("long").alias("_y"),
    )
    j = left.join(right, ["img", "px", "py"])
    agg = j.groupBy("img").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    L = float(dynamic_range)
    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    n = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    vx = F.col("sxx").cast("double") / n - mx * mx
    vy = F.col("syy").cast("double") / n - my * my
    cxy = F.col("sxy").cast("double") / n - mx * my
    ssim = ((2.0 * mx * my + F.lit(c1)) * (2.0 * cxy + F.lit(c2))) / (
        (mx * mx + my * my + F.lit(c1)) * (vx + vy + F.lit(c2))
    )
    return agg.select("img", "n", "sx", "sy", "sxx", "syy", "sxy",
                      ssim.alias("ssim"))