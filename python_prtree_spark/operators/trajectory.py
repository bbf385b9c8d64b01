"""Trajectory analytics over point streams — north-rule extension: given
timestamped lng/lat pings per entity, compute per-entity movement
statistics (hop count, total/max great-circle hop length) — the standard
GPS-track summarization op (movingpandas / ST_MakeLine+ST_Length shape).

Plan: ONE shuffle on the entity key; within each partition a window
ordered by (ts, ping id) pairs every ping with its predecessor (lag), the
haversine hop length evaluates as pure JVM column arithmetic, and each
hop is quantized to integer meters BEFORE the per-entity sum — long
addition is order-independent, so the aggregate is partitioning-proof
and exactly oracle-gateable (same fixed-point trick as
distance_join/area_weighted_transfer).

Skew note: entities are users/devices — the per-key row count is bounded
by one entity's ping history, not the corpus; a power-law hot entity
still fits a task since the window is a single linear pass. No Python
anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_prtree_spark.operators.distance import EARTH_RADIUS_KM

__all__ = ["trajectory_stats"]


def trajectory_stats(
    pings_df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """→ (entity, n_pings, n_hops, total_m, max_m): pings ordered by
    (ts, id) — the id breaks timestamp ties deterministically — with each
    consecutive pair contributing one haversine hop in integer meters
    (floor(d_km * 1000)). Entities with a single ping report 0 hops."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    plng, plat = F.lag(lng).over(w), F.lag(lat).over(w)
    sdphi = F.sin((F.radians(lat) - F.radians(plat)) / F.lit(2.0))
    sdlam = F.sin((F.radians(lng) - F.radians(plng)) / F.lit(2.0))
    h = sdphi * sdphi \
        + F.cos(F.radians(plat)) * F.cos(F.radians(lat)) * sdlam * sdlam
    dkm = F.lit(2.0) * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(F.lit(1.0), h)))
    hop_m = F.floor(dkm * F.lit(1000.0)).cast("long")
    hops = pings_df.select(
        F.col(entity_col).alias("entity"),
        F.when(plat.isNotNull(), hop_m).alias("_hop"),
    )
    return hops.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.count("_hop").alias("n_hops"),
        F.coalesce(F.sum("_hop"), F.lit(0)).cast("long").alias("total_m"),
        F.coalesce(F.max("_hop"), F.lit(0)).cast("long").alias("max_m"),
    )
