"""Point-in-polygon join — north-rule extension (raster↔vector machinery;
the reference has no polygon support).

Two-phase, both phases 100% JVM-side (no Python UDF at all):

  phase 1 (prefilter): points (as degenerate boxes) vs polygon bounding
    boxes through the same cell-routed batch_query join — candidate pairs;
  phase 2 (exact): explode polygon edges (posexplode, still codegen) and
    decide per pair:
      * mode='convex'  — inclusive half-plane test: for a CCW ring, point
        is inside iff every edge cross product >= 0 (boundary counts);
      * mode='raycast' — odd crossing parity for arbitrary simple polygons
        (boundary behavior is the standard half-open rule).

Polygon table schema (FIXTURES.md F5): poly_id, ring array<struct<x,y>>,
xmin/ymin/xmax/ymax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["point_in_polygon_join"]


def point_in_polygon_join(
    polys_df: DataFrame,
    points_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    poly_id: str = "poly_id",
    point_id: str = "pid",
    x: str = "x",
    y: str = "y",
    mode: str = "convex",
) -> DataFrame:
    """→ (pid, poly_id) pairs where the point lies inside the polygon."""
    if mode not in ("convex", "raycast"):
        raise ValueError(f"unknown mode {mode!r}")

    # polygons routed by their bounding boxes; points as degenerate boxes.
    # batch_query is id-type-generic, so poly_id joins back directly — no
    # synthetic key (monotonically_increasing_id is not stable under
    # recomputation/retries, so it must never be a join key).
    cand = _probe.point_query(
        polys_df.select(F.col(poly_id).alias("id"), "xmin", "ymin", "xmax", "ymax"),
        points_df.select(F.col(point_id).alias("qid"), F.col(x).alias("x"), F.col(y).alias("y")),
        cfg, data_id="id", query_id="qid",
    ).select(F.col("qid").alias(point_id), F.col("id").alias(poly_id))

    pts = points_df.select(point_id, F.col(x).alias("_px"), F.col(y).alias("_py"))
    edges = (
        cand.join(polys_df.select(poly_id, "ring"), on=poly_id)
        .join(pts, on=point_id)
        .select(
            point_id, poly_id, "_px", "_py",
            F.posexplode("ring").alias("_i", "_v"),
            F.size("ring").alias("_nv"),
            F.col("ring").alias("_ring"),
        )
        .withColumn("_w", F.element_at("_ring", (F.col("_i") + 1) % F.col("_nv") + 1))
        .select(
            point_id, poly_id, "_px", "_py",
            F.col("_v.x").alias("x1"), F.col("_v.y").alias("y1"),
            F.col("_w.x").alias("x2"), F.col("_w.y").alias("y2"),
        )
    )

    if mode == "convex":
        cross = (
            (F.col("x2") - F.col("x1")) * (F.col("_py") - F.col("y1"))
            - (F.col("y2") - F.col("y1")) * (F.col("_px") - F.col("x1"))
        )
        return (
            edges.groupBy(point_id, poly_id)
            .agg(F.min(cross).alias("_min_cross"))
            .where(F.col("_min_cross") >= 0)
            .select(point_id, poly_id)
        )

    # raycast: standard crossing-number parity (half-open edge rule)
    crosses = (
        ((F.col("y1") > F.col("_py")) != (F.col("y2") > F.col("_py")))
        & (
            F.col("_px")
            < (F.col("x2") - F.col("x1"))
            * (F.col("_py") - F.col("y1"))
            / (F.col("y2") - F.col("y1"))
            + F.col("x1")
        )
    )
    return (
        edges.groupBy(point_id, poly_id)
        .agg(F.sum(F.when(crosses, 1).otherwise(0)).alias("_n_cross"))
        .where(F.col("_n_cross") % 2 == 1)
        .select(point_id, poly_id)
    )
