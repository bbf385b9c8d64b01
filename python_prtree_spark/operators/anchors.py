"""Anchor label assignment — the step that turns ground-truth boxes into
per-anchor training targets for one-stage detectors (RetinaNet, Lin et
al., ICCV 2017 s4; the YOLO family's grid assignment is the 1-template
case). At 10^12 images this is a trillion-anchor-label job; the key scale
fact is that the anchor grid is IMPLICIT — the same fixed template set at
every image — so it must never be materialized as a table.

Semantics (RetinaNet rule): anchors live at stride-spaced cell centers,
one box per (cell, size template). Each anchor takes its best-IoU ground
truth (ties to the smaller gt id); the anchor is labeled ``pos`` if that
IoU >= 1/2, ``ign`` (ignored in the loss) if 2/5 <= IoU < 1/2, ``neg``
otherwise. Anchors overlapping NO ground truth are the negative ocean and
are never emitted — at web scale they are the complement, generated
implicitly by the training loader; this operator emits exactly the
anchors with a positive intersection.

Distributed shape, 100% JVM:

  1. per ground-truth box, enumerate the anchors that can intersect it —
     closed-form index ranges per size template (sequence + explode; the
     fan-out is (gt_w/stride + size/stride + 2) x (...) anchors, bounded
     by the object size, never the canvas);
  2. exact fixed-point IoU: gt coords are 1/1000 rationals scaled to
     int64, anchor coords are integers in the same scale, so inter and
     union are exact int64 — thresholds are integer cross-products;
  3. ONE shuffle: groupBy (img, anchor) keeps the best gt per anchor via
     a lexicographic struct max ordered by (IoU as float64, -gt_id) —
     the same IEEE division both engines evaluate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anchor_assign", "anchor_targets"]


def anchor_assign(
    gts: DataFrame,
    stride: int = 16,
    sizes: tuple[int, ...] = (16, 32, 64),
    scale: int = 1000,
    img_col: str = "img",
    id_col: str = "id",
) -> DataFrame:
    """Assign ground-truth boxes to the implicit anchor grid -> one row
    per anchor with positive overlap: (img, ax, ay, k, gt_id,
    inter_units, union_units, iou, label).

    ``stride`` and ``sizes`` are in coordinate units (anchor (ax, ay, k)
    is the square of side sizes[k] centered at (ax*stride + stride/2,
    ay*stride + stride/2)); gt coords x ``scale`` must be integral.
    Anchors index from 0 — ground truth hanging past the canvas origin
    is clamped to ax, ay >= 0."""
    st = int(stride) * int(scale)
    half_st = st // 2
    kv = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("k"), F.lit(int(s) * int(scale)).alias("sz"))
            for i, s in enumerate(sizes)
        ])
    ).alias("kv")
    g = gts.select(
        F.col(img_col).cast("long").alias("img"),
        F.col(id_col).cast("long").alias("gt_id"),
        F.round(F.col("xmin") * scale).cast("long").alias("gx0"),
        F.round(F.col("ymin") * scale).cast("long").alias("gy0"),
        F.round(F.col("xmax") * scale).cast("long").alias("gx1"),
        F.round(F.col("ymax") * scale).cast("long").alias("gy1"),
    ).select("*", kv).select(
        "img", "gt_id", "gx0", "gy0", "gx1", "gy1",
        F.col("kv.k").alias("k"),
        F.col("kv.sz").alias("sz"),
    )
    half = F.col("sz") / F.lit(2)  # sizes*scale are even for integer sizes
    # anchor x-range with overlap: st*ax + half_st - half < gx1
    #                          AND st*ax + half_st + half > gx0 (open —
    # touching boxes have zero intersection and are the negative ocean)
    ax_lo = F.greatest(
        F.lit(0),
        F.floor((F.col("gx0") - half_st - half) / F.lit(st) + 1).cast("long"),
    )
    ax_hi = F.ceil((F.col("gx1") - half_st + half) / F.lit(st) - 1).cast("long")
    ay_lo = F.greatest(
        F.lit(0),
        F.floor((F.col("gy0") - half_st - half) / F.lit(st) + 1).cast("long"),
    )
    ay_hi = F.ceil((F.col("gy1") - half_st + half) / F.lit(st) - 1).cast("long")
    cand = (
        g.where(ax_hi >= ax_lo)
        .withColumn("ax", F.explode(F.sequence(ax_lo, ax_hi)))
        .where(ay_hi >= ay_lo)
        .withColumn("ay", F.explode(F.sequence(ay_lo, ay_hi)))
    )
    ax0 = F.col("ax") * st + half_st - F.col("sz") / 2
    ax1 = F.col("ax") * st + half_st + F.col("sz") / 2
    ay0 = F.col("ay") * st + half_st - F.col("sz") / 2
    ay1 = F.col("ay") * st + half_st + F.col("sz") / 2
    ix = F.least(F.col("gx1"), ax1) - F.greatest(F.col("gx0"), ax0)
    iy = F.least(F.col("gy1"), ay1) - F.greatest(F.col("gy0"), ay0)
    inter = (ix * iy).cast("long")
    union = (
        (F.col("gx1") - F.col("gx0")) * (F.col("gy1") - F.col("gy0"))
        + F.col("sz") * F.col("sz")
        - inter
    ).cast("long")
    scored = cand.where((ix > 0) & (iy > 0)).select(
        "img", "ax", "ay", "k", "gt_id",
        inter.alias("inter_units"),
        union.alias("union_units"),
        (inter.cast("double") / union.cast("double")).alias("iou"),
    )
    best = scored.groupBy("img", "ax", "ay", "k").agg(
        F.max(
            F.struct(
                F.col("iou").alias("iou"),
                (-F.col("gt_id")).alias("ng"),
                F.col("inter_units").alias("inter_units"),
                F.col("union_units").alias("union_units"),
            )
        ).alias("b")
    )
    i_u = F.col("b.inter_units")
    u_u = F.col("b.union_units")
    return best.select(
        "img", "ax", "ay", "k",
        (-F.col("b.ng")).alias("gt_id"),
        i_u.alias("inter_units"),
        u_u.alias("union_units"),
        F.col("b.iou").alias("iou"),
        F.when(i_u * 2 >= u_u, F.lit("pos"))
        .when(i_u * 5 >= u_u * 2, F.lit("ign"))
        .otherwise(F.lit("neg"))
        .alias("label"),
    )


def anchor_targets(
    gts: DataFrame,
    stride: int = 16,
    sizes: tuple[int, ...] = (16, 32, 64),
    scale: int = 1000,
    img_col: str = "img",
    id_col: str = "id",
) -> DataFrame:
    """Box-regression targets for the POSITIVE anchors of
    ``anchor_assign`` — the rows a detector training job actually
    materializes -> (img, ax, ay, k, gt_id, tx, ty, wr, hr, tx_num,
    ty_num, t_den).

    Standard R-CNN/RetinaNet encoding relative to the square anchor of
    side s: tx = (gt_cx - anchor_cx)/s, ty likewise, and the SIZE
    targets are emitted as the exact ratios wr = gt_w/s, hr = gt_h/s —
    the conventional tw = ln(wr) is left to the training loader because
    ln() is libm-dependent and would break cross-engine bit-equality,
    while wr is a ratio of exact int64s (monotone in tw, so nothing is
    lost). tx/ty are also carried as exact integers: tx = tx_num/t_den
    with tx_num = gx0+gx1-2*anchor_cx and t_den = 2s, all in 1/scale
    units.

    One (img, gt_id)-keyed join beyond anchor_assign's single shuffle —
    img rides in the key so gt ids only need to be unique per image (the
    same contract as anchor_assign's explode), never globally."""
    st = int(stride) * int(scale)
    half_st = st // 2
    a = anchor_assign(gts, stride, sizes, scale, img_col, id_col).where(
        F.col("label") == "pos"
    )
    g = gts.select(
        F.col(img_col).cast("long").alias("img"),
        F.col(id_col).cast("long").alias("gt_id"),
        F.round(F.col("xmin") * scale).cast("long").alias("gx0"),
        F.round(F.col("ymin") * scale).cast("long").alias("gy0"),
        F.round(F.col("xmax") * scale).cast("long").alias("gx1"),
        F.round(F.col("ymax") * scale).cast("long").alias("gy1"),
    )
    j = a.join(g, ["img", "gt_id"])
    sz = F.element_at(
        F.array(*[F.lit(int(s) * int(scale)) for s in sizes]),
        (F.col("k") + 1).cast("int"),
    )
    acx = F.col("ax") * st + half_st
    acy = F.col("ay") * st + half_st
    tx_num = F.col("gx0") + F.col("gx1") - 2 * acx
    ty_num = F.col("gy0") + F.col("gy1") - 2 * acy
    t_den = 2 * sz
    return j.select(
        "img", "ax", "ay", "k", "gt_id",
        (tx_num.cast("double") / t_den.cast("double")).alias("tx"),
        (ty_num.cast("double") / t_den.cast("double")).alias("ty"),
        ((F.col("gx1") - F.col("gx0")).cast("double") / sz.cast("double")).alias("wr"),
        ((F.col("gy1") - F.col("gy0")).cast("double") / sz.cast("double")).alias("hr"),
        tx_num.alias("tx_num"),
        ty_num.alias("ty_num"),
        t_den.alias("t_den"),
    )
