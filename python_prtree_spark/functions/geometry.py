"""Closed-interval AABB geometry: the single predicate the whole engine is
built around, plus ingest validation.

Reference semantics (the ONLY arbiter of query results):
  boxes A, B intersect  ⇔  ∀d: max(A.min_d, B.min_d) <= min(A.max_d, B.max_d)
(/root/reference/include/prtree/core/detail/bounding_box.h:104-123; oracle in
tests/conftest.py:56-58). Touching boxes intersect; degenerate boxes and
points are valid; float64 throughout so a ~5e-6 gap at coordinate ~75 does
NOT intersect (tests/unit/test_precision.py:58-80).

Validation reproduces prtree.h:151-185: NaN/Inf rejected, min<=max per
dimension enforced, optional subnormal detection — vectorized, raising on
the first bad row like the reference ctor does.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import EngineConfig

BOX_COLS = ("xmin", "ymin", "xmax", "ymax")

# smallest positive normal float64; reference rejects subnormals when
# detect_subnormal_ is on (prtree.h:165-177)
_MIN_NORMAL = np.finfo(np.float64).tiny


# ---------------------------------------------------------------------------
# predicate
# ---------------------------------------------------------------------------

def aabb_intersects_col(a: str, b: str) -> Column:
    """Spark column predicate: boxes under prefixes ``a``/``b`` intersect.

    Closed intervals in both dimensions — touching counts."""
    return (
        (F.col(f"{a}.xmin") <= F.col(f"{b}.xmax"))
        & (F.col(f"{b}.xmin") <= F.col(f"{a}.xmax"))
        & (F.col(f"{a}.ymin") <= F.col(f"{b}.ymax"))
        & (F.col(f"{b}.ymin") <= F.col(f"{a}.ymax"))
    )


def aabb_intersects_np(q: np.ndarray, d: np.ndarray) -> np.ndarray:
    """(m,4) query boxes vs (n,4) data boxes → (m,n) bool mask. Broadcasted
    numpy twin of ``aabb_intersects_col`` — bitwise-identical decisions."""
    return (
        (q[:, None, 0] <= d[None, :, 2])
        & (d[None, :, 0] <= q[:, None, 2])
        & (q[:, None, 1] <= d[None, :, 3])
        & (d[None, :, 1] <= q[:, None, 3])
    )


# ---------------------------------------------------------------------------
# validation (reference prtree.h:151-185)
# ---------------------------------------------------------------------------

def validate_boxes_np(boxes: np.ndarray, cfg: EngineConfig) -> None:
    """Raise ValueError on NaN/Inf, min>max, or (optionally) subnormals —
    mirroring the reference's ctor/insert validation messages."""
    boxes = np.asarray(boxes, dtype=np.float64)
    if boxes.ndim != 2 or boxes.shape[1] != 4:
        raise ValueError(f"Boxes must be shape (n, 4); got {boxes.shape}")
    if not np.isfinite(boxes).all():
        raise ValueError("Box coordinates must be finite (no NaN/Inf)")
    if (boxes[:, 0] > boxes[:, 2]).any() or (boxes[:, 1] > boxes[:, 3]).any():
        raise ValueError("Box min must be <= max in every dimension")
    if cfg.detect_subnormal:
        nz = boxes[boxes != 0.0]
        if nz.size and (np.abs(nz) < _MIN_NORMAL).any():
            raise ValueError("Subnormal coordinates detected")


def box_col_names(dims: int) -> tuple[list[str], list[str]]:
    """(min cols, max cols) for a D-dim box table: the 2D engine names
    (xmin, ymin / xmax, ymax) or the nd convention (min0.. / max0..)."""
    if dims == 2:
        return ["xmin", "ymin"], ["xmax", "ymax"]
    return ([f"min{d}" for d in range(dims)], [f"max{d}" for d in range(dims)])


def validate_boxes_df(df: DataFrame, cfg: EngineConfig, dims: int = 2) -> None:
    """Distributed validation: one aggregate pass; raises like the
    reference's ctor. Used by build_index before any shuffle."""
    mins, maxs = box_col_names(dims)
    cols = mins + maxs
    # ONE sum per failure class (not per column): the error messages never
    # name the offending column, so 2*dims+3 aggregation buffers collapse
    # to 3 — fewer buffers per row and a smaller plan, same raises
    finite_pred = None
    for c in cols:
        t = ~F.col(c).isNotNull() | F.isnan(c) | (F.abs(F.col(c)) == float("inf"))
        finite_pred = t if finite_pred is None else (finite_pred | t)
    order_pred = None
    for lo, hi in zip(mins, maxs):
        t = F.col(lo) > F.col(hi)
        order_pred = t if order_pred is None else (order_pred | t)
    agg = [
        F.sum(F.when(finite_pred, 1).otherwise(0)).alias("bad_finite"),
        F.sum(F.when(order_pred, 1).otherwise(0)).alias("bad_order"),
    ]
    if cfg.detect_subnormal:
        sub = None
        for c in cols:
            t = (F.col(c) != 0.0) & (F.abs(F.col(c)) < F.lit(float(_MIN_NORMAL)))
            sub = t if sub is None else (sub | t)
        agg.append(F.sum(F.when(sub, 1).otherwise(0)).alias("bad_subnormal"))
    d = df.agg(*agg).collect()[0].asDict()
    if d["bad_finite"]:
        raise ValueError("Box coordinates must be finite (no NaN/Inf)")
    if d["bad_order"]:
        raise ValueError("Box min must be <= max in every dimension")
    if cfg.detect_subnormal and d.get("bad_subnormal"):
        raise ValueError("Subnormal coordinates detected")
