"""Linear-geometry operators: point-to-segment matching ("snap to nearest
road") — the map-matching primitive every GPS pipeline runs after the
spatial join. North-rule extension; the reference handles boxes only
(core.py), segments are the natural next geometry type.

Point-to-segment distance (exact, closed form):

    t  = clamp(((p-a)·(b-a)) / |b-a|², 0, 1)      (degenerate |ab|=0 → t=0)
    d² = |p - (a + t·(b-a))|²

All arithmetic is the same IEEE double sequence in Spark and DuckDB; d²
is quantized to 1e-6 fixed point (floor) and the PER-POINT WINNER is
chosen by (dist2_q, seg_id) — ranking on the quantized long makes the
tie-break deterministic and engine-independent (two segments within one
quantum of each other resolve by id, identically everywhere).

Distributed plan — ONE spatial shuffle + one skinny window:

  1. each point expands to a ±radius square and routes through the
     cell-partitioned ``batch_query`` against the segment BOUNDING
     BOXES (certificate: d(p, seg) <= r implies the square intersects
     the segment's bbox — the bbox contains the whole segment);
  2. exact JVM d² refine + the closed d² <= r² predicate;
  3. row_number() over (point) ordered by (dist2_q, seg_id) keeps the
     nearest match — the window input is already answer-sized (points ×
     few candidate segments), not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["nearest_segment_join"]


def nearest_segment_join(
    segments_df: DataFrame,
    points_df: DataFrame,
    radius: float,
    cfg: EngineConfig = DEFAULT_CONFIG,
    seg_id: str = "seg_id",
    query_id: str = "qid",
    x: str = "x",
    y: str = "y",
    n_data_hint: int | None = None,
) -> DataFrame:
    """segments_df: (seg_id, ax, ay, bx, by) endpoints; points_df:
    (query_id, x, y). → (qid, seg_id, dist2_q): each point's NEAREST
    segment within ``radius`` (quantized-distance rank, seg_id
    tie-break); points with no segment in range emit nothing."""
    r = float(radius)
    if not (r >= 0.0):  # also rejects NaN
        raise ValueError(f"radius must be >= 0, got {radius!r}")
    segs = segments_df.select(
        seg_id, "ax", "ay", "bx", "by",
        F.least("ax", "bx").alias("xmin"), F.least("ay", "by").alias("ymin"),
        F.greatest("ax", "bx").alias("xmax"), F.greatest("ay", "by").alias("ymax"),
    )
    pts = points_df.select(
        query_id, F.col(x).alias("_px"), F.col(y).alias("_py")
    )
    squares = pts.select(
        query_id,
        (F.col("_px") - r).alias("xmin"), (F.col("_py") - r).alias("ymin"),
        (F.col("_px") + r).alias("xmax"), (F.col("_py") + r).alias("ymax"),
    )
    cand = _probe.batch_query(
        segs.select(seg_id, "xmin", "ymin", "xmax", "ymax"),
        squares, cfg, data_id=seg_id, query_id=query_id,
        n_data_hint=n_data_hint,
    )
    abx, aby = F.col("bx") - F.col("ax"), F.col("by") - F.col("ay")
    apx, apy = F.col("_px") - F.col("ax"), F.col("_py") - F.col("ay")
    ab2 = abx * abx + aby * aby
    # degenerate zero-length segment → t = 0 (distance to the point a)
    t = F.when(
        ab2 > 0.0,
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), (apx * abx + apy * aby) / ab2)),
    ).otherwise(F.lit(0.0))
    dx = apx - t * abx
    dy = apy - t * aby
    dist2 = dx * dx + dy * dy
    w = Window.partitionBy(query_id).orderBy("dist2_q", seg_id)
    return (
        cand.join(segs.select(seg_id, "ax", "ay", "bx", "by"), on=seg_id)
        .join(pts, on=query_id)
        .withColumn("dist2_q", F.floor(dist2 * F.lit(1e6)).cast("long"))
        .where(dist2 <= F.lit(r * r))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(query_id, seg_id, "dist2_q")
    )
