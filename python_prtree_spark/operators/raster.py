"""Raster ↔ vector join (north rule): image footprint boxes (the raster
side — decoded image extents) against convex vector polygons, exact.

Two phases, both pure-JVM (no Python UDF):

  phase 1: footprint AABB vs polygon-bbox candidates through the same
    cell-routed spatial join as batch_query (this IS the x/y axis pair of
    the separating-axis test);
  phase 2: exact convex-polygon vs AABB intersection by the Separating
    Axis Theorem over the polygon's edge normals — edges exploded with
    posexplode, vertex projections via array ``transform`` +
    ``array_min/max``, box-corner projections via least/greatest of the
    four corners. A pair intersects iff NO axis separates (closed
    intervals: touching counts, consistent with the engine's AABB
    predicate).

Output: (raster_id, poly_id) pairs, duplicate-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["raster_vector_join"]


def raster_vector_join(
    rasters_df: DataFrame,
    polys_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    raster_id: str = "image_id",
    poly_id: str = "poly_id",
) -> DataFrame:
    """rasters_df: (raster_id, xmin, ymin, xmax, ymax) footprint boxes;
    polys_df: (poly_id, ring array<struct<x,y>>, xmin, ymin, xmax, ymax).
    → (raster_id, poly_id) where footprint and convex polygon intersect."""
    # phase 1: bbox candidates (the x/y axes of SAT). batch_query is
    # id-type-generic, so poly_id joins back directly — no synthetic key
    # (monotonically_increasing_id is unstable under recomputation).
    cand = _probe.batch_query(
        polys_df.select(F.col(poly_id).alias("id"), "xmin", "ymin", "xmax", "ymax"),
        rasters_df.select(F.col(raster_id).alias("qid"), "xmin", "ymin", "xmax", "ymax"),
        cfg, data_id="id", query_id="qid",
    ).select(F.col("qid").alias(raster_id), F.col("id").alias(poly_id))

    boxes = rasters_df.select(
        raster_id,
        F.col("xmin").alias("bx0"), F.col("ymin").alias("by0"),
        F.col("xmax").alias("bx1"), F.col("ymax").alias("by1"),
    )
    edges = (
        cand.join(polys_df.select(poly_id, "ring"), on=poly_id)
        .join(boxes, on=raster_id)
        .select(
            raster_id, poly_id, "ring", "bx0", "by0", "bx1", "by1",
            F.posexplode("ring").alias("_i", "_v"),
            F.size("ring").alias("_nv"),
        )
        .withColumn("_w", F.element_at("ring", (F.col("_i") + 1) % F.col("_nv") + 1))
        # edge normal n = (-(y2-y1), x2-x1)
        .withColumn("nx", -(F.col("_w.y") - F.col("_v.y")))
        .withColumn("ny", F.col("_w.x") - F.col("_v.x"))
    )
    # polygon projection interval on n (over ALL vertices of the ring)
    proj = F.transform("ring", lambda v: F.col("nx") * v.x + F.col("ny") * v.y)
    p_min, p_max = F.array_min(proj), F.array_max(proj)
    # box projection interval on n (four corners)
    corners = [
        F.col("nx") * F.col(x) + F.col("ny") * F.col(y)
        for x in ("bx0", "bx1") for y in ("by0", "by1")
    ]
    b_min, b_max = F.least(*corners), F.greatest(*corners)
    separated = (b_max < p_min) | (p_max < b_min)
    return (
        edges.withColumn("_sep", F.when(separated, 1).otherwise(0))
        .groupBy(raster_id, poly_id)
        .agg(F.max("_sep").alias("_any_sep"))
        .where(F.col("_any_sep") == 0)
        .select(raster_id, poly_id)
    )
