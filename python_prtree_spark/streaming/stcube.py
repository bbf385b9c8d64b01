"""Streaming space-time cube — the watermarked twin of
operators/stcube.st_cube (same two-form pattern as sessionization and
trajectory: a batch aggregate, plus the Structured Streaming form whose
state the watermark bounds).

One plan for both: tile columns are stateless whole-stage-codegen
expressions, the time bucket is Spark's own ``window()`` (so the
streaming engine can expire state once the watermark passes a window's
end), and the aggregate is the identical count + fixed-point value sum.
On an unbounded stream, state is O(open windows x occupied tiles) —
bounded by the watermark horizon, never by stream length.

Contract linking the two (tested): on a bounded input the streaming
query's complete output equals ``st_cube`` run in batch over the same
rows (bucket = epoch seconds of the window start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_prtree_spark.functions.geo import lnglat_tile_cols, tile_id_col

__all__ = ["st_cube_stream"]


def st_cube_stream(
    events: DataFrame,
    zoom: int,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    lng: str = "lng",
    lat: str = "lat",
    value: str = "value",
    quantize_scale: int = 1000,
) -> DataFrame:
    """→ (t_bucket, tx, ty, tile_id, n_events, sum_value_q) — the batch
    operator's schema; works on a static OR streaming DataFrame."""
    tx, ty = lnglat_tile_cols(F.col(lng), F.col(lat), zoom)
    vq = F.floor(F.col(value) * F.lit(int(quantize_scale))).cast("long")
    # watermarks require TIMESTAMP (an NTZ parquet column is rejected)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col), tx.alias("tx"), ty.alias("ty"), vq.alias("_vq")
        )
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "tx", "ty")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("_vq").cast("long").alias("sum_value_q"),
        )
        .select(
            F.unix_micros(F.col("win.start")).cast("long").alias("_bus"),
            "tx", "ty", "n_events", "sum_value_q",
        )
        .select(
            (F.col("_bus") / 1_000_000).cast("long").alias("t_bucket"),
            "tx", "ty",
            tile_id_col(F.col("tx"), F.col("ty"), zoom).alias("tile_id"),
            "n_events", "sum_value_q",
        )
    )
