"""Density-based spatial clustering — ST_ClusterDBSCAN parity with
deterministic border assignment.

Semantics (PostGIS ST_ClusterDBSCAN / Ester et al. 1996):
  * core point  — at least ``min_pts`` points within ``eps`` (closed
    disk, the point itself counts, as in PostGIS);
  * cluster     — connected component of core points under the
    within-eps relation; cluster id = MIN core id in the component
    (deterministic, engine-independent);
  * border      — non-core within eps of >= 1 core: joins the SMALLEST
    cluster id among its core neighbors (PostGIS leaves this arbitrary;
    min-id makes the result reproducible and SQL-oracle-gateable);
  * noise       — everything else: cluster NULL.

Reference scope note: the reference engine (atksh/python_prtree) has no
clustering surface; this builds on the engine's own distance_join and
connected_components operators.

Plan shape: the within-eps pair generation IS the engine's spatial
distance_join (points as degenerate boxes probed with +-eps squares: one
cell-routed shuffle, exact dist² refine) — no all-pairs stage at any
scale. Degrees are one groupBy over the pair stream; the component merge
runs the alternating-star loop (O(log² n) rounds) or the bounded driver
union-find for small graphs. DBSCAN's density parameterization keeps the
pair volume ~ n · E[neighbors], the same bound a single-node
implementation pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators.components import connected_components
from python_prtree_spark.operators.distance import distance_join

__all__ = ["dbscan"]


def dbscan(
    points_df: DataFrame,
    eps: float,
    min_pts: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """→ one row per input point: (id_col, n_within, is_core, cluster).

    n_within counts points within eps INCLUDING the point itself;
    cluster is NULL for noise."""
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    pts = points_df.select(F.col(id_col).alias("_pid"),
                           F.col(x).alias("_x"), F.col(y).alias("_y"))
    boxes = pts.select(
        F.col("_pid").alias("_bid"),
        F.col("_x").alias("xmin"), F.col("_y").alias("ymin"),
        F.col("_x").alias("xmax"), F.col("_y").alias("ymax"),
    )
    probes = pts.select(F.col("_pid").alias("_qid"),
                        F.col("_x").alias("x"), F.col("_y").alias("y"))
    # (qid, bid) point pairs with dist <= eps — includes the self pair, so
    # the degree IS PostGIS's self-inclusive count
    pairs = distance_join(
        boxes, probes, eps, cfg, data_id="_bid", query_id="_qid",
    ).select("_qid", "_bid")

    deg = pairs.groupBy("_qid").agg(F.count(F.lit(1)).cast("long").alias("n_within"))
    core = deg.where(F.col("n_within") >= min_pts).select(
        F.col("_qid").alias("_cid")
    )
    nonself = pairs.where(F.col("_qid") != F.col("_bid"))
    core_edges = (
        nonself
        .join(core.withColumnRenamed("_cid", "_qid"), on="_qid", how="left_semi")
        .join(core.withColumnRenamed("_cid", "_bid"), on="_bid", how="left_semi")
    )
    comp = connected_components(core_edges, "_qid", "_bid").select(
        F.col("node").alias("_cid"), F.col("component").alias("_comp")
    )
    # singleton cores (no other core within eps) are absent from the edge
    # graph: they form their own cluster
    core_cluster = core.join(comp, on="_cid", how="left").select(
        F.col("_cid"),
        F.coalesce("_comp", F.col("_cid")).alias("cluster"),
    )
    # border: non-core with core neighbors -> smallest neighbor cluster
    border = (
        nonself
        .join(core_cluster.withColumnRenamed("_cid", "_bid"), on="_bid")
        .join(core.withColumnRenamed("_cid", "_qid"), on="_qid", how="left_anti")
        .groupBy("_qid").agg(F.min("cluster").alias("cluster"))
    )
    assign = core_cluster.select(
        F.col("_cid").alias("_pid"), "cluster", F.lit(True).alias("is_core")
    ).unionByName(
        border.select(F.col("_qid").alias("_pid"), "cluster",
                      F.lit(False).alias("is_core"))
    )
    return (
        pts.select("_pid")
        .join(deg.withColumnRenamed("_qid", "_pid"), on="_pid", how="left")
        .join(assign, on="_pid", how="left")
        .select(
            F.col("_pid").alias(id_col),
            F.coalesce("n_within", F.lit(1).cast("long")).alias("n_within"),
            F.coalesce("is_core", F.lit(False)).alias("is_core"),
            F.col("cluster").cast("long").alias("cluster"),
        )
    )
