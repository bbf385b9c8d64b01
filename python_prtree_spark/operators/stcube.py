"""Space-time cube aggregation — the spatiotemporal binning every
geo-event warehouse runs (ArcGIS "create space time cube" / ST_Bin +
time_bucket in the PostGIS/Timescale world): events fold into
(time bucket, web-mercator tile) cells with count and fixed-point value
sums.

Reference scope note: the reference engine (atksh/python_prtree) has no
temporal surface; this extends the engine's geographic tiling family
(functions/geo.py, the H3/S2 partitioner role of the north rule) to the
events stream.

Plan shape: pure column expressions into ONE groupBy — partial (map-side)
aggregation makes hot cells (a city core at rush hour) a non-issue, the
classic reason aggregation skew differs from join skew; no kernel, no
collect. At 100 TB the cube is the canonical downsample-then-analyze
step: output cardinality is bounded by (#buckets x #occupied tiles),
independent of event count.

The value sum is quantized per event BEFORE the long sum (floor(v *
scale)) so the result is exactly associative — bit-identical under any
partitioning and reproducible by an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.functions.geo import lnglat_tile_cols, tile_id_col

__all__ = ["st_cube"]


def st_cube(
    df: DataFrame,
    zoom: int,
    window_sec: int,
    ts_col: str = "ts",
    lng: "str | Column" = "lng",
    lat: "str | Column" = "lat",
    value: "str | Column | None" = "value",
    quantize_scale: int = 1000,
) -> DataFrame:
    """→ (t_bucket, tx, ty, tile_id, n_events, sum_value_q).

    t_bucket = epoch seconds floored to ``window_sec`` (long — engine- and
    timezone-independent); (tx, ty, tile_id) = slippy tile at ``zoom``;
    sum_value_q = sum of floor(value * quantize_scale) as long (omitted
    when ``value`` is None).
    """
    if window_sec <= 0:
        raise ValueError(f"window_sec must be positive, got {window_sec}")
    lng_c = F.col(lng) if isinstance(lng, str) else lng
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    tx, ty = lnglat_tile_cols(lng_c, lat_c, zoom)
    # unix_micros, not unix_timestamp: the latter round-trips through the
    # session timezone; raw epoch micros are engine- and tz-independent
    # (DuckDB twin: epoch_us)
    bucket = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(int(window_sec) * 1_000_000)
        ) * F.lit(int(window_sec))
    ).cast("long")
    cols = [
        bucket.alias("t_bucket"),
        tx.alias("tx"), ty.alias("ty"),
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value is not None:
        v = F.col(value) if isinstance(value, str) else value
        cols.append(
            F.floor(v * F.lit(int(quantize_scale))).cast("long").alias("_vq")
        )
        aggs.append(F.sum("_vq").cast("long").alias("sum_value_q"))
    out = ["t_bucket", "tx", "ty", "tile_id", "n_events"]
    if value is not None:
        out.append("sum_value_q")
    return (
        df.select(*cols)
        .groupBy("t_bucket", "tx", "ty")
        .agg(*aggs)
        .withColumn("tile_id", tile_id_col(F.col("tx"), F.col("ty"), zoom))
        .select(*out)
    )
