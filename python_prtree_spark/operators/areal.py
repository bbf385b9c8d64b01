"""Area-weighted spatial transfer (areal interpolation) — north-rule
extension: redistribute a value carried by source boxes onto overlapping
target zones, weighted by the fraction of each source's area that falls in
the zone. The canonical vector analytics op for moving a measure between
two incompatible partitionings of space (census blocks → grid cells,
image footprints → map tiles).

Semantics (closed boxes, strictly-positive overlap area):

    w(src, zone)  = area(src ∩ zone) / area(src)
    contrib       = value(src) * w(src, zone)
    zone result   = (n_src, Σ contrib)   over all srcs with area(∩) > 0

Box∩box area is pure min/max arithmetic — the same IEEE double sequence
in Spark and DuckDB, so the operator is exactly oracle-gateable. Each
pair's contribution is quantized to fixed-point BEFORE the sum
(floor(contrib·1e6) as long): long addition is associative, making the
aggregate independent of partitioning/summation order — the same trick
as distance_join's dist2_q (cross-engine float SUM order is not
reproducible; long SUM is).

Distributed plan — exactly ONE spatial shuffle, no new machinery:

  1. zones route through the cell-partitioned ``batch_query`` against the
     source boxes (PBSM single shuffle, packed kernel, hot-cell salting —
     all inherited); candidates are the closed-overlap superset.
  2. JVM-side exact refine to strictly-positive intersection area and the
     fixed-point contribution (whole-stage codegen, no Python).
  3. groupBy(zone) over ~24-byte partial rows — map-side combine, so even
     a zone covering the whole corpus aggregates without materializing
     pairs anywhere.

Reference contrast: the reference engine stops at pair enumeration
(query_intersections, include/prtree/core.h); the transfer step is the
standard GIS areal-weighting op a pipeline runs on those pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.operators import probe as _probe

__all__ = ["area_weighted_transfer"]

BOX = ["xmin", "ymin", "xmax", "ymax"]


def area_weighted_transfer(
    src_df: DataFrame,
    zones_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    src_id: str = "id",
    zone_id: str = "zone_id",
    value_col: str = "value",
    n_data_hint: int | None = None,
) -> DataFrame:
    """src_df: (src_id, xmin..ymax, value_col) — boxes carrying a measure;
    zones_df: (zone_id, xmin..ymax) — target zones.
    → (zone_id, n_src, val_q): contributing-source count and the
    area-weighted sum in 1e-6 fixed point (floor per pair, exact long sum).
    Degenerate (zero-area) sources contribute nothing (their weight is
    0/0) — the refine filters them with the zero-overlap pairs."""
    zones = zones_df.select(zone_id, *BOX)
    cand = _probe.batch_query(
        src_df.select(src_id, *BOX), zones, cfg,
        data_id=src_id, query_id=zone_id, n_data_hint=n_data_hint,
    )
    src = src_df.select(
        src_id, F.col(value_col).alias("_val"),
        F.col("xmin").alias("sx0"), F.col("ymin").alias("sy0"),
        F.col("xmax").alias("sx1"), F.col("ymax").alias("sy1"),
    )
    zb = zones.select(
        zone_id,
        F.col("xmin").alias("zx0"), F.col("ymin").alias("zy0"),
        F.col("xmax").alias("zx1"), F.col("ymax").alias("zy1"),
    )
    iw = F.least("sx1", "zx1") - F.greatest("sx0", "zx0")
    ih = F.least("sy1", "zy1") - F.greatest("sy0", "zy0")
    sarea = (F.col("sx1") - F.col("sx0")) * (F.col("sy1") - F.col("sy0"))
    # parenthesization mirrors the SQL oracle expression-for-expression
    contrib_q = F.floor(
        F.col("_val") * ((iw * ih) / sarea) * F.lit(1e6)
    ).cast("long")
    return (
        cand.join(src, on=src_id)
        .join(zb, on=zone_id)
        .where((iw > 0) & (ih > 0) & (sarea > 0))
        .select(zone_id, contrib_q.alias("_cq"))
        .groupBy(zone_id)
        .agg(
            F.count(F.lit(1)).alias("n_src"),
            F.sum("_cq").alias("val_q"),
        )
    )
