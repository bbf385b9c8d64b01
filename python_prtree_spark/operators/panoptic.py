"""Panoptic segmentation evaluation (Kirillov et al., "Panoptic
Segmentation", CVPR 2019 s4) over distributed label rasters — the metric
pipeline for segmentation training data: match predicted segments to
ground-truth segments by IoU > 1/2 (provably at most one match per
segment at that threshold), then PQ = (sum of matched IoUs) /
(TP + FP/2 + FN/2), the product of segmentation quality (SQ) and
recognition quality (RQ).

Inputs are sparse label rasters — (gx, gy, label) rows for labeled
pixels only, the same representation the engine's rasterize/polygonize
family uses; void pixels are simply absent. Labels are opaque segment
ids (globally unique, e.g. image_id * K + instance).

Distributed shape, 100% JVM:
  * segment sizes: one groupBy per side (map-side combined);
  * pairwise intersections: ONE co-partitioned equi-join on the pixel
    key + one (plabel, glabel) groupBy — only overlapping pairs ever
    materialize, |pairs| <= |intersection pixels|;
  * the match test and all counts are exact int64; IoU is one float64
    division (identical on the DuckDB oracle), and the only cross-row
    float reduction is quantized to floor(iou * 1e9) int64 first, so
    the PQ summary is order-free and hash-gates.

At 10^12-image scale the pixel join partitions by pixel key (balanced by
construction) and every aggregate is segment-granular; nothing holds a
whole image, let alone the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_matches", "panoptic_quality", "confusion_matrix", "class_iou"]


def _sides(pred: DataFrame, gt: DataFrame):
    p = pred.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("label").cast("long").alias("plabel"),
    )
    g = gt.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("label").cast("long").alias("glabel"),
    )
    return p, g


def segment_matches(
    pred: DataFrame,
    gt: DataFrame,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """Every (pred segment, gt segment) pair with a non-empty pixel
    intersection -> (plabel, glabel, n_i, n_p, n_g, iou, matched).
    ``matched`` is IoU > t_num/t_den as the integer cross-product; at
    the canonical t = 1/2 each segment matches at most one partner
    (intersections are disjoint, so IoU > 1/2 twice is impossible)."""
    p, g = _sides(pred, gt)
    n_p = p.groupBy("plabel").agg(F.count("*").alias("n_p"))
    n_g = g.groupBy("glabel").agg(F.count("*").alias("n_g"))
    inter = (
        p.join(g, ["gx", "gy"])
        .groupBy("plabel", "glabel")
        .agg(F.count("*").alias("n_i"))
    )
    j = inter.join(n_p, "plabel").join(n_g, "glabel")
    union = F.col("n_p") + F.col("n_g") - F.col("n_i")
    return j.select(
        "plabel", "glabel", "n_i", "n_p", "n_g",
        (F.col("n_i").cast("double") / union.cast("double")).alias("iou"),
        (F.col("n_i") * F.lit(int(t_den)) > F.lit(int(t_num)) * union).alias(
            "matched"
        ),
    )


def panoptic_quality(
    pred: DataFrame,
    gt: DataFrame,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """ONE row: (n_pred, n_gt, n_tp, n_fp, n_fn, sq_units, pq).

    sq_units = sum over matched pairs of floor(iou * 1e9) — the exact
    int64 surrogate for the IoU sum; pq = (sq_units/1e9) /
    (n_tp + n_fp/2 + n_fn/2), NULL when both rasters are empty."""
    m = segment_matches(pred, gt, t_num, t_den)
    p, g = _sides(pred, gt)
    tp = m.where("matched").agg(
        F.count("*").alias("n_tp"),
        F.coalesce(
            F.sum(F.floor(F.col("iou") * F.lit(1_000_000_000.0)).cast("long")),
            F.lit(0),
        ).alias("sq_units"),
    )
    np_ = p.agg(F.count_distinct("plabel").alias("n_pred"))
    ng = g.agg(F.count_distinct("glabel").alias("n_gt"))
    row = np_.crossJoin(ng).crossJoin(tp)
    n_fp = F.col("n_pred") - F.col("n_tp")
    n_fn = F.col("n_gt") - F.col("n_tp")
    denom = (
        F.col("n_tp").cast("double")
        + n_fp.cast("double") / F.lit(2.0)
        + n_fn.cast("double") / F.lit(2.0)
    )
    return row.select(
        "n_pred", "n_gt", "n_tp",
        n_fp.alias("n_fp"),
        n_fn.alias("n_fn"),
        "sq_units",
        F.when(
            denom > 0,
            (F.col("sq_units").cast("double") / F.lit(1_000_000_000.0)) / denom,
        ).alias("pq"),
    )


def confusion_matrix(pred: DataFrame, gt: DataFrame) -> DataFrame:
    """Pixel-level confusion matrix for SEMANTIC segmentation (labels =
    class ids, not instances) -> (pclass, gclass, n) for every observed
    class pair. Pixels labeled on only one side count against the other
    side's class with partner class NULL (the void row/column of the
    standard matrix). One co-partitioned full-outer pixel join + one
    class-pair groupBy — exact counts, trivially hash-gated."""
    p, g = _sides(pred, gt)
    joined = p.withColumnRenamed("plabel", "pclass").join(
        g.withColumnRenamed("glabel", "gclass"), ["gx", "gy"], "full_outer"
    )
    return joined.groupBy("pclass", "gclass").agg(F.count("*").alias("n"))


def class_iou(pred: DataFrame, gt: DataFrame) -> DataFrame:
    """Per-class IoU table (the mIoU decomposition of semantic
    segmentation evaluation) -> (cls, n_tp, n_fp, n_fn, iou) for every
    class present on either side.

    n_tp = pixels labeled cls on both sides; n_fp = predicted cls but
    gt says otherwise (or void); n_fn = gt cls but prediction says
    otherwise (or void); iou = tp/(tp+fp+fn) as one float64 division of
    exact int64 counts — mIoU is the caller's average over rows.
    Derived entirely from the confusion matrix: no second pass over
    pixels."""
    cm = confusion_matrix(pred, gt)
    tp = (
        cm.where(F.col("pclass") == F.col("gclass"))
        .select(F.col("pclass").alias("cls"), F.col("n").alias("n_tp"))
    )
    ppix = cm.where(F.col("pclass").isNotNull()).groupBy(
        F.col("pclass").alias("cls")
    ).agg(F.sum("n").alias("n_pred"))
    gpix = cm.where(F.col("gclass").isNotNull()).groupBy(
        F.col("gclass").alias("cls")
    ).agg(F.sum("n").alias("n_gt"))
    j = (
        ppix.join(gpix, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_tp", F.lit(0)).alias("n_tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.coalesce("n_tp", F.lit(0))).alias(
                "n_fp"
            ),
            (F.coalesce("n_gt", F.lit(0)) - F.coalesce("n_tp", F.lit(0))).alias(
                "n_fn"
            ),
        )
    )
    denom = F.col("n_tp") + F.col("n_fp") + F.col("n_fn")
    return j.select(
        "cls", "n_tp", "n_fp", "n_fn",
        F.when(denom > 0, F.col("n_tp").cast("double") / denom.cast("double"))
        .alias("iou"),
    )
