"""Non-maximum suppression over detection boxes — the dedup step every
object-detection data pipeline runs between the detector and the training
table (a 10^12-image corpus with ~10-100 proposals per image is a
trillion-box NMS problem; single-node implementations assume the whole
detection set fits in one process).

Reference tie-in: NMS is box-overlap self-join + suppression — the same
AABB intersection semantics as the reference's ``query_intersections``
(/root/reference/include/prtree/core/prtree.h:839-958), with IoU replacing
the boolean overlap test and a score order deciding who survives.

Two published variants, both exact here:

* ``mode="greedy"`` — classic sequential NMS (Felzenszwalb et al., PAMI
  2010): visit boxes in (score DESC, id ASC) order; keep a box iff it has
  IoU <= t with every box KEPT so far. Inherently sequential along
  suppression chains — but the chains live inside connected components of
  the IoU>t graph, and the decision for a box provably depends only on its
  component (suppression travels along IoU>t edges only). So the
  distributed plan is: overlap pairs (cell self-join) -> IoU filter ->
  connected components (large/small-star) -> per-component greedy inside
  one Arrow batch. That is the maximal theoretical parallelism for exact
  greedy NMS; components are small in practice (overlap clusters of one
  object), and a pathological all-overlapping corpus degrades to one group
  — document, don't hide.

* ``mode="dominance"`` — one-pass parallel relaxation (the suppression
  rule of Matrix-NMS, Wang et al., CVPR 2020, with a hard threshold): box
  b is suppressed iff SOME higher-ranked box a has IoU(a,b) > t, whether
  or not a itself survives. Over-suppresses relative to greedy (a box
  suppressed by a suppressed box still dies) but is embarrassingly
  parallel: one cell self-join + one anti-join, no iteration.

IoU > t is evaluated as the cross-multiplied comparison
``inter * den > num * union`` (t = num/den rational), an identical IEEE
double expression on both engines, so both modes are hash-gateable —
greedy's oracle is a recursive CTE that replays the sequential algorithm.

Scale shape: candidate pairs come from the engine's cell-grid self-join
(one shuffle, AQE skew-split); components run the engine's
``connected_components`` (O(log^2 n) rounds, small-graph driver
short-circuit); the greedy kernel is ``applyInPandas`` over component ids
(one shuffle on component). Scores and ids stay JVM-side until the final
per-component kernel, which receives only (id, score, coords) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.functions.tiling import explode_cells, ref_cell_col
from python_prtree_spark.operators.components import connected_components

__all__ = ["nms_boxes", "overlap_iou_pairs"]

BOX = ["xmin", "ymin", "xmax", "ymax"]


def _iou_exceeds(t_num: int, t_den: int):
    """IoU(a, b) > t_num/t_den as a cross-multiplied column predicate —
    no division, so the oracle's identical expression matches bitwise."""
    ix = F.greatest(
        F.lit(0.0),
        F.least("a_xmax", "b_xmax") - F.greatest("a_xmin", "b_xmin"),
    )
    iy = F.greatest(
        F.lit(0.0),
        F.least("a_ymax", "b_ymax") - F.greatest("a_ymin", "b_ymin"),
    )
    inter = ix * iy
    area_a = (F.col("a_xmax") - F.col("a_xmin")) * (F.col("a_ymax") - F.col("a_ymin"))
    area_b = (F.col("b_xmax") - F.col("b_xmin")) * (F.col("b_ymax") - F.col("b_ymin"))
    union = area_a + area_b - inter
    return inter * F.lit(float(t_den)) > F.lit(float(t_num)) * union


def overlap_iou_pairs(
    dets: DataFrame,
    t_num: int,
    t_den: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """All pairs with IoU > t_num/t_den, each exactly once (id_a < id_b),
    with both scores attached. Cell-grid self-join: candidates meet in a
    shared cell, the reference-point rule keeps one canonical copy —
    same anti-duplication as pairs.py's SQL path."""
    cols = [id_col, score_col, *BOX]
    data_c = explode_cells(dets.select(*cols), cfg.extent, cfg.level)
    a = data_c.select(
        F.col(id_col).alias("id_a"), F.col(score_col).alias("score_a"), "cell",
        *[F.col(c).alias(f"a_{c}") for c in BOX],
    )
    b = data_c.select(
        F.col(id_col).alias("id_b"), F.col(score_col).alias("score_b"), "cell",
        *[F.col(c).alias(f"b_{c}") for c in BOX],
    )
    ref = ref_cell_col(
        F.col("a_xmin"), F.col("a_ymin"), F.col("b_xmin"), F.col("b_ymin"),
        cfg.extent, cfg.level,
    )
    return (
        a.join(b, on="cell")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (ref == F.col("cell"))
            & _iou_exceeds(t_num, t_den)
        )
        .select("id_a", "id_b", "score_a", "score_b")
    )


def _greedy_kernel(pdf):
    """Exact sequential greedy NMS over ONE connected component.

    numpy row loop over a single overlap cluster — component sizes are
    object-level (a handful to a few hundred boxes); the quadratic
    kept-vs-candidate IoU check is vectorized over the kept set.
    """
    import numpy as np
    import pandas as pd

    t_num = int(pdf["_tn"].iloc[0])
    t_den = int(pdf["_td"].iloc[0])
    order = np.lexsort((pdf["id"].to_numpy(), -pdf["score"].to_numpy()))
    ids = pdf["id"].to_numpy()[order]
    xmin = pdf["xmin"].to_numpy()[order]
    ymin = pdf["ymin"].to_numpy()[order]
    xmax = pdf["xmax"].to_numpy()[order]
    ymax = pdf["ymax"].to_numpy()[order]
    area = (xmax - xmin) * (ymax - ymin)
    kept_idx: list[int] = []
    kept = np.zeros(len(ids), dtype=bool)
    for i in range(len(ids)):
        if kept_idx:
            k = np.asarray(kept_idx)
            ix = np.maximum(
                0.0, np.minimum(xmax[k], xmax[i]) - np.maximum(xmin[k], xmin[i])
            )
            iy = np.maximum(
                0.0, np.minimum(ymax[k], ymax[i]) - np.maximum(ymin[k], ymin[i])
            )
            inter = ix * iy
            union = area[k] + area[i] - inter
            if bool(np.any(inter * float(t_den) > float(t_num) * union)):
                continue
        kept[i] = True
        kept_idx.append(i)
    return pd.DataFrame({"id": ids, "kept": kept})


def nms_boxes(
    dets: DataFrame,
    t_num: int = 1,
    t_den: int = 2,
    cfg: EngineConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    score_col: str = "score",
    mode: str = "greedy",
) -> DataFrame:
    """Non-maximum suppression -> (id, kept) for EVERY input box.

    ``score_col`` must be integer-valued (long) so the (score DESC,
    id ASC) visit order is engine-independent; ``t_num/t_den`` is the IoU
    threshold as an exact rational (default 1/2).
    """
    if mode not in ("greedy", "dominance"):
        raise ValueError(f"mode must be greedy|dominance, got {mode!r}")
    base = dets.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(score_col).cast("long").alias("score"),
        *BOX,
    )
    pairs = overlap_iou_pairs(
        base, t_num, t_den, cfg, id_col="id", score_col="score"
    )
    if mode == "dominance":
        # rank(a) above rank(b) iff score_a > score_b, ties to the lower id
        a_dominates = (F.col("score_a") > F.col("score_b")) | (
            (F.col("score_a") == F.col("score_b")) & (F.col("id_a") < F.col("id_b"))
        )
        suppressed = pairs.select(
            F.when(a_dominates, F.col("id_b")).otherwise(F.col("id_a")).alias("id")
        ).distinct()
        return base.join(suppressed.withColumn("_s", F.lit(True)), "id", "left").select(
            "id", F.coalesce(~F.col("_s"), F.lit(True)).alias("kept")
        )
    comp = connected_components(pairs.select("id_a", "id_b"))
    grouped = (
        base.join(comp, base["id"] == comp["node"], "left")
        .select(
            "id", "score", *BOX,
            F.coalesce(F.col("component"), F.col("id")).alias("_comp"),
        )
        .withColumn("_tn", F.lit(t_num))
        .withColumn("_td", F.lit(t_den))
    )
    # isolated boxes (no IoU>t neighbor) form singleton components and are
    # trivially kept by the kernel; every box flows through one code path.
    return grouped.groupBy("_comp").applyInPandas(
        _greedy_kernel, schema="id long, kept boolean"
    )
